"""EpochTable: replay-safe epoch-partitioned state with snapshots.

Pins the two contracts the streaming ingest leans on (VERDICT r8 #3b):
reads never see the reading batch's own (possibly torn) writes, and read
cost is bounded by the snapshot cadence — it stops growing with stream
age once compaction runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.streaming.epochstate import EpochTable


def _df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "x bigint")


def _vals(df):
    return sorted(r.x for r in df.collect())


def test_read_before_sees_strictly_prior_epochs(spark, tmp_path):
    t = EpochTable(str(tmp_path / "t"))
    assert t.read_before(spark, 0) is None
    t.write_delta(_df(spark, [0, 1]), 0)
    t.write_delta(_df(spark, [10, 11]), 1)
    assert t.read_before(spark, 1) is not None
    assert _vals(t.read_before(spark, 1)) == [0, 1]
    assert _vals(t.read_before(spark, 2)) == [0, 1, 10, 11]
    # a torn write from THIS epoch's crashed attempt stays invisible
    t.write_delta(_df(spark, [999]), 2)
    assert _vals(t.read_before(spark, 2)) == [0, 1, 10, 11]
    assert _vals(t.read_delta(spark, 2)) == [999]


def test_delta_overwrite_is_replay_idempotent(spark, tmp_path):
    t = EpochTable(str(tmp_path / "t"))
    t.write_delta(_df(spark, [1, 2, 3]), 0)
    t.write_delta(_df(spark, [1, 2, 3]), 0)  # replay
    assert _vals(t.read_all(spark)) == [1, 2, 3]


def test_snapshot_bounds_read_cost(spark, tmp_path):
    """With one delta per batch, batch N reads N directories; snapshots
    cap that at snapshot_every regardless of N — the small-files /
    listing amplifier fix."""
    every = 4
    t = EpochTable(str(tmp_path / "t"), snapshot_every=every)
    flat = EpochTable(str(tmp_path / "flat"), snapshot_every=10**6)
    for e in range(10):
        for tbl in (t, flat):
            tbl.write_delta(_df(spark, [e * 100, e * 100 + 1]), e)
            tbl.maybe_snapshot(spark, e)
    assert len(flat.paths_before(10)) == 10  # what the fix removes
    for e in range(11):
        assert len(t.paths_before(e)) <= every, (e, t.paths_before(e))
    # identical visible state at every epoch, and in the final summary
    for e in range(11):
        a, b = t.read_before(spark, e), flat.read_before(spark, e)
        assert (a is None) == (b is None)
        if a is not None:
            assert _vals(a) == _vals(b)
    assert _vals(t.read_all(spark)) == _vals(flat.read_all(spark))


def test_snapshot_is_union_of_covered_deltas(spark, tmp_path):
    t = EpochTable(str(tmp_path / "t"), snapshot_every=4)
    rows = []
    for e in range(4):
        t.write_delta(_df(spark, [e, e + 50]), e)
        rows += [e, e + 50]
        t.maybe_snapshot(spark, e)
    snap = spark.read.parquet(str(tmp_path / "t" / "kind=snap" / "upto=4"))
    assert _vals(snap) == sorted(rows)


def test_replay_at_snapshot_boundary_rewrites_identically(spark, tmp_path):
    t = EpochTable(str(tmp_path / "t"), snapshot_every=4)
    for e in range(4):
        t.write_delta(_df(spark, [e]), e)
        assert t.maybe_snapshot(spark, e) == (e == 3)
    before = _vals(t.read_all(spark))
    # replay epoch 3: delta rewritten, snapshot re-derived from the same
    # committed inputs -> same state
    t.write_delta(_df(spark, [3]), 3)
    assert t.maybe_snapshot(spark, 3)
    assert _vals(t.read_all(spark)) == before
    assert _vals(t.read_before(spark, 4)) == before


def test_torn_snapshot_from_crashed_attempt_is_invisible(spark, tmp_path):
    """Crash after writing snap upto=N+1 but before the checkpoint
    commit: the replay of batch N must not read that snapshot (it may be
    half-written) — read_before(N) only accepts tags <= N."""
    t = EpochTable(str(tmp_path / "t"), snapshot_every=4)
    for e in range(3):
        t.write_delta(_df(spark, [e]), e)
        t.maybe_snapshot(spark, e)
    # crashed attempt of epoch 3: wrong delta + the snapshot built on it
    t.write_delta(_df(spark, [666]), 3)
    t.maybe_snapshot(spark, 3)
    assert _vals(t.read_before(spark, 3)) == [0, 1, 2]  # junk invisible
    # replay writes the right rows; both partitions self-heal
    t.write_delta(_df(spark, [3]), 3)
    t.maybe_snapshot(spark, 3)
    assert _vals(t.read_all(spark)) == [0, 1, 2, 3]


def test_snapshot_every_must_be_positive(tmp_path):
    with pytest.raises(ValueError):
        EpochTable(str(tmp_path / "t"), snapshot_every=0)


@pytest.mark.slow  # 54 s; the bounded-read invariant itself is pinned by
# test_snapshot_bounds_read_cost (11 s) — this is the long-horizon replay
# depth pass (r13 default-fast profile, VERDICT r12 #3)
def test_ingest_read_cost_bounded_by_compaction(spark, tmp_path):
    """Drive the REAL ingest body over ten micro-batches with a
    snapshot cadence of 4: state reads stay <= 4 directories per table
    at every batch (vs 10 uncompacted), and the final state is
    row-identical to an uncompacted run — compaction changes cost, never
    content."""
    from stream_processing_pipeline_spark.plans.streamq import (
        corpus_ingest_batch,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .localCheckpoint()
    )
    layouts = {
        "compacted": dict(snapshot_every=4),
        "flat": dict(snapshot_every=10**6),
    }
    state = {}
    for name, kw in layouts.items():
        index_dir = str(tmp_path / name / "idx")
        seen_dir = str(tmp_path / name / "seen")
        for e in range(10):
            corpus_ingest_batch(
                docs.filter(F.col("doc_id") % 10 == e),
                e,
                index_dir,
                seen_dir,
                **kw,
            )
        state[name] = (
            EpochTable(index_dir),
            EpochTable(seen_dir),
        )
    idx_c, seen_c = state["compacted"]
    idx_f, seen_f = state["flat"]
    for e in range(1, 11):
        assert len(idx_c.paths_before(e)) <= 4
        assert len(seen_c.paths_before(e)) <= 4
    assert len(idx_f.paths_before(10)) == 10
    for a, b, key in (
        (idx_c, idx_f, "doc_id"),
        (seen_c, seen_f, "text_hash"),
    ):
        va = sorted(r[0] for r in a.read_all(spark).select(key).collect())
        vb = sorted(r[0] for r in b.read_all(spark).select(key).collect())
        assert va == vb and len(va) > 0
        assert len(set(va)) == len(va)  # epoch-exclusive invariant holds
