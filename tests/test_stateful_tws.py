"""transformWithStateInPandas: construction always, execution where possible.

The Spark 4 stateful-processor wire protocol needs ``google.protobuf`` in
the Python environment (see streaming/stateful.py docstring). This container
lacks it, so the execution test self-skips — the same honest gating as the
Kafka/SMTP live paths. Construction (processor init contract, builder plan
shape) is pinned unconditionally so API drift still fails fast here.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.streaming.stateful import (
    HAS_TWS_RUNTIME,
    RunningStatsProcessor,
    user_stats_transform_with_state,
)


def test_processor_constructs_and_aggregates_locally():
    """The processor's row-handling logic, driven directly (no stream)."""
    import pandas as pd

    proc = RunningStatsProcessor()

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def getValueState(self, name, schema, ttl_duration_ms=None):
            assert name == "agg"
            assert "BIGINT" in schema
            return FakeValueState()

    proc.init(FakeHandle())
    batch = pd.DataFrame({"c": [100, 250, 50]})
    out = list(proc.handleInputRows((7,), iter([batch]), None))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["user_id"], row["n_events"], row["total_cents"]) == (7, 3, 400)
    # second batch accumulates into the same state
    out2 = list(proc.handleInputRows((7,), iter([pd.DataFrame({"c": [10]})]), None))
    row2 = out2[0].iloc[0]
    assert (row2["n_events"], row2["total_cents"]) == (4, 410)
    proc.close()


def test_builder_produces_tws_plan(spark):
    """groupBy().transformWithStateInPandas appears in the analyzed plan."""
    narrow = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "user_id long, c long"
    )
    out = user_stats_transform_with_state(narrow)
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "total_cents",
    ]
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "TransformWithState" in plan


@pytest.mark.skipif(
    not HAS_TWS_RUNTIME,
    reason="google.protobuf absent: transformWithState state server cannot run",
)
def test_tws_stream_equals_batch(spark, tmp_path):
    """One-file availableNow TWS run == batch groupBy (runs where protobuf exists)."""
    from stream_processing_pipeline_spark.streaming.runner import ROCKSDB_PROVIDER

    sf_dir = "/root/testdata/sf0.001"
    raw_schema = spark.read.parquet(sf_dir + "/events.parquet").schema
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        narrow = stream.select(
            "user_id", F.expr("CAST(round(value*100) AS LONG)").alias("c")
        )
        stats = user_stats_transform_with_state(narrow)
        q = (
            stats.writeStream.format("memory")
            .queryName("tws_equiv")
            .outputMode("append")
            .option(
                "checkpointLocation", tempfile.mkdtemp(dir=tmp_path, prefix="tws_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        got = {
            r["user_id"]: (r["n_events"], r["total_cents"])
            for r in spark.table("tws_equiv").collect()
        }
        want = {
            r["user_id"]: (r["n"], r["c"])
            for r in spark.read.parquet(sf_dir + "/events.parquet")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.expr("CAST(round(value*100) AS LONG)")).alias("c"),
            )
            .collect()
        }
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_event_time_timeout_closes_sessions_exactly_once(spark, tmp_path):
    """Timer-driven sessionization (GroupStateTimeout.EventTimeTimeout):

    - a gap INSIDE a batch closes a session immediately (closed_by=gap);
    - inactivity closes a session when the WATERMARK passes last+gap —
      the timed-out invocation path, which only fires because another
      key's later events advanced the watermark (closed_by=timeout);
    - a session still under its timer when the stream ends is NOT
      emitted (stays in state for a resumed run).

    Two one-file micro-batches (maxFilesPerTrigger=1, lexicographic file
    order) make watermark movement deterministic: after batch 1 the
    watermark is 50,000 s (user 9's event), so batch 2 fires the timers
    user 7 and user 8 armed in batch 1."""
    import pandas as pd  # noqa: F401 - exercised inside the operator
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from stream_processing_pipeline_spark.streaming.stateful import (
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        session_timeout_update,
    )

    src = tmp_path / "src"
    src.mkdir()
    schema = "user_id long, sec long"
    batches = [
        [  # batch 0: wm starts at 0
            (7, 1000), (7, 1600),       # one open session; timer at 3400s
            (8, 1000), (8, 10000),      # in-batch gap -> [1000,1000] closes
            (9, 50000),                 # advances wm to 50000s after batch 0
        ],
        [  # batch 1: wm=50000s -> timers for 7 (3400s) and 8 (11800s) fire
            (9, 51000),                 # 9 continues; timer re-armed 52800s
        ],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .select(
            "user_id",
            F.timestamp_seconds(F.col("sec")).alias("ts"),
            (F.col("sec") * 1_000_000).alias("ts_us"),
        )
        .withWatermark("ts", "0 seconds")
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        session_timeout_update,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    import uuid

    name = f"sess_timeout_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    rows = {
        (r.user_id, r.session_start_us): r for r in spark.table(name).collect()
    }
    S = 1_000_000
    # in-batch gap close (batch 0)
    r8a = rows[(8, 1000 * S)]
    assert (r8a.session_last_us, r8a.n_events, r8a.closed_by) == (
        1000 * S, 1, "gap",
    )
    # timer closes after watermark advance (batch 1)
    r7 = rows[(7, 1000 * S)]
    assert (r7.session_last_us, r7.n_events, r7.closed_by) == (
        1600 * S, 2, "timeout",
    )
    r8b = rows[(8, 10000 * S)]
    assert (r8b.session_last_us, r8b.n_events, r8b.closed_by) == (
        10000 * S, 1, "timeout",
    )
    # user 9's session is still open under its timer -> never emitted
    assert not [k for k in rows if k[0] == 9]
    assert len(rows) == 3
