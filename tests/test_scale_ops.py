"""Invariants for the round-3 scale operators: mergeable histograms,
Bloom-prefiltered semi-joins, salted joins.

The registered queries value-hash-verify results against DuckDB; these pin
the operator-level contracts the oracles exercise only indirectly — merge
associativity on arbitrary splits, the no-false-negatives guarantee, the
false-positive rate actually being small, and salting changing the plan
without changing the result."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_pipeline_spark.operators.bloom import (
    bloom_bitmap,
    bloom_might_contain,
    bloom_prefilter,
)
from stream_processing_pipeline_spark.operators.histogram import (
    histogram_quantiles,
    merge_histograms,
    value_histogram,
)
from stream_processing_pipeline_spark.operators.joins import salted_join

from .conftest import SF_MED


def _events(spark):
    from stream_processing_pipeline_spark.plans.common import catalog

    return catalog(spark, SF_MED).events


def test_histogram_merge_is_lossless(spark):
    """Histograms built per (day, type) and merged to type must equal the
    histogram built directly at type grain — on any split dimension."""
    ev = _events(spark).withColumn("day", F.to_date("ts"))
    direct = value_histogram(ev, "value", ["event_type"]).toPandas()
    merged = merge_histograms(
        value_histogram(ev, "value", ["day", "event_type"]), ["event_type"]
    ).toPandas()
    key = ["event_type", "bin"]
    d = direct.sort_values(key, ignore_index=True)
    m = merged.sort_values(key, ignore_index=True)
    assert d.equals(m.astype(d.dtypes.to_dict()))


def test_histogram_quantiles_bracket_exact(spark):
    """The estimate is the upper edge of the bin holding the ceil(q*n)-th
    order statistic (inverse-CDF semantics, NOT the interpolated
    `percentile()`): it must bracket that order statistic from above within
    one bin width."""
    import math

    ev = _events(spark)
    hist = value_histogram(ev, "value", ["event_type"])
    est = histogram_quantiles(hist, ["event_type"]).toPandas().set_index("event_type")
    pdf = ev.select("event_type", "value").toPandas()
    for t, grp in pdf.groupby("event_type"):
        vals = sorted(grp["value"])
        for q in (50, 90, 99):
            stat = vals[math.ceil(q * len(vals) / 100) - 1]
            h = est.loc[t, f"p{q}"]
            assert h >= stat - 1e-9, (t, q, stat, h)
            assert h - stat < 5.0, (t, q, stat, h)  # one $5 bin


def _supplier_keys(spark):
    """A genuinely selective key set: one nation's suppliers (~10% of
    suppliers, ~10% of lineitems at sf0.01)."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.common import catalog

    cat = catalog(spark, SF_MED)
    return (
        cat.supplier.join(
            cat.nation.filter(F.col("n_name") == "NATION_9"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
        .distinct()
    ), cat.lineitem


def test_bloom_has_no_false_negatives(spark):
    keys, _ = _supplier_keys(spark)
    words = bloom_bitmap(keys, "s_suppkey")
    misses = keys.filter(~bloom_might_contain("s_suppkey", words)).count()
    assert misses == 0


def test_bloom_false_positive_rate_is_small(spark):
    """At default sizing (2^16 bits, k=4, tens of keys) absent keys should
    essentially never pass; allow <1% to keep the bound honest for larger
    key sets."""
    keys, lineitem = _supplier_keys(spark)
    words = bloom_bitmap(keys, "s_suppkey")
    non_members = (
        lineitem.select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
        .join(keys, "s_suppkey", "left_anti")
    )
    n_non = non_members.count()
    assert n_non > 0  # the key set must be selective for this test to bite
    fp = non_members.filter(bloom_might_contain("s_suppkey", words)).count()
    assert fp / n_non < 0.01, (fp, n_non)


def test_bloom_prefilter_plus_join_equals_plain_semijoin(spark):
    keys, lineitem = _supplier_keys(spark)
    words = bloom_bitmap(keys, "s_suppkey")
    cond = F.col("l_suppkey") == F.col("s_suppkey")
    pre = bloom_prefilter(lineitem, words, "l_suppkey").join(
        keys, cond, "left_semi"
    )
    plain = lineitem.join(keys, cond, "left_semi")
    n_pre, n_plain = pre.count(), plain.count()
    assert n_pre == n_plain > 0
    assert (
        pre.select("l_orderkey", "l_linenumber")
        .exceptAll(plain.select("l_orderkey", "l_linenumber"))
        .count()
        == 0
    )
    # the prefilter must actually prune: passed rows ~= matching rows, far
    # below the full scan
    passed = bloom_prefilter(lineitem, words, "l_suppkey").count()
    assert passed < lineitem.count() * 0.5
    assert passed >= n_plain


def test_salted_join_matches_plain_join_and_salts_the_plan(spark):
    ev = _events(spark)
    stats = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    salted = salted_join(
        ev, stats.hint("merge"), on=["event_type"], salt_src="event_id", n_salt=8
    )
    plain = ev.join(stats, "event_type")
    assert salted.count() == plain.count()
    got = salted.groupBy("event_type").agg(F.sum("n_t").alias("s")).toPandas()
    want = plain.groupBy("event_type").agg(F.sum("n_t").alias("s")).toPandas()
    key = "event_type"
    assert got.sort_values(key, ignore_index=True).equals(
        want.sort_values(key, ignore_index=True)
    )
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    join_line = next(l for l in plan.splitlines() if "SortMergeJoin" in l)
    assert "_salt" in join_line  # the salt is part of the join keys
    assert "_salt" not in salted.columns  # and never leaves the operator


def test_histogram_bins_match_oracle_on_negative_values(spark):
    """Spark floor vs DuckDB // diverge on negatives (-1.5 -> -2 vs -1);
    hist_bin_sql must use explicit floor so the twin stays exact for
    signed values (deltas, refunds), not just the positive fixture."""
    import duckdb

    from stream_processing_pipeline_spark.operators.histogram import (
        hist_bin_sql,
        value_histogram,
    )

    vals = [-12.34, -5.0, -0.01, 0.0, 0.01, 2.49, 2.5, 7.51]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {
        r.bin: r.n
        for r in value_histogram(df, "value", [], width_cents=500).collect()
    }
    rows = duckdb.sql(
        "SELECT "
        + hist_bin_sql("value", 500)
        + " AS bin, count(*) AS n FROM (SELECT unnest("
        + str(vals)
        + ") AS value) GROUP BY bin"
    ).fetchall()
    want = {b: n for b, n in rows}
    assert got == want


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    ev = _events(spark).limit(10)
    stats = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    for how in ("right", "full", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(ev, stats, ["event_type"], "event_id", how=how)


# ----------------------------------------------------------- bucketed join


def test_bucketed_join_has_no_exchange(spark):
    """The whole point of the bucketed tables: the orders⋈lineitem
    sort-merge join must read co-located bucketed scans — NO Exchange
    anywhere in the join subtree (broadcast disabled so the
    bucket-vs-shuffle choice is actually exercised). Sort nodes DO remain:
    Spark >= 3.0 does not propagate bucket sort order from the scan by
    default (SPARK-28595; ``spark.sql.legacy.bucketedTableScanOutputOrdering``)
    — those sorts are bucket-local over already-sorted single-file runs,
    no shuffle behind them. Result parity with the raw-parquet join is the
    registered oracle's job; this pins the physical plan the technique
    exists for."""
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.scalex import _bucketed_tables

    o_name, l_name = _bucketed_tables(spark, SF_MED)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(o_name).join(
            spark.table(l_name), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        # and the result equals the raw-parquet join
        cat = catalog(spark, SF_MED)
        raw = cat.orders.join(
            cat.lineitem, F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partition_pruned_scan_lists_only_range(spark):
    """The date filter must land in PartitionFilters (file-listing-level
    pruning), and the pruned scan must read exactly the in-range subset a
    full-scan filter would return."""
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.scalex import (
        _date_partitioned_events,
    )

    path = _date_partitioned_events(spark, SF_MED)
    ev = spark.read.parquet(path)
    lo, hi = "2024-01-10", "2024-01-13"
    pruned = ev.filter(
        (F.col("event_date") >= F.lit(lo).cast("date"))
        & (F.col("event_date") < F.lit(hi).cast("date"))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters")[1][:200]
    # no post-scan Filter on the partition column: pruning is total
    raw = catalog(spark, SF_MED).events
    want = raw.filter(
        (F.col("ts").cast("date") >= F.lit(lo).cast("date"))
        & (F.col("ts").cast("date") < F.lit(hi).cast("date"))
    ).count()
    assert pruned.count() == want > 0


def test_bloom_membership_audit_no_false_negatives(spark):
    """Bloom contract: every exact member hits the filter (no false
    negatives — so n_false_pos is exactly n_maybe - n_exact), and counts
    nest properly per probe source."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = REGISTRY["bloom_source_membership_audit"].fn(spark, SF_MED).collect()
    assert rows, "at least one probe source"
    for r in rows:
        assert 0 <= r.n_exact <= r.n_maybe <= r.n_probed
        assert r.n_false_pos == r.n_maybe - r.n_exact


# --------------------------------------------- range join & window funnel


def test_range_join_matches_bruteforce_overlap(spark):
    """The asymmetric bucketed interval join must return EXACTLY the
    cross-join-filtered overlap pairs (orientation cover.start <=
    probe.start), across bucket boundaries, multi-bucket-spanning
    intervals, same-bucket-no-overlap false candidates, and disjoint
    equi-keys."""
    import datetime as dt

    from stream_processing_pipeline_spark.operators.joins import range_join

    d = dt.date(2024, 1, 1)

    def mk(rows, a, b):
        return spark.createDataFrame(
            [
                (k, i, d + dt.timedelta(days=s), d + dt.timedelta(days=e))
                for i, (k, s, e) in enumerate(rows)
            ],
            f"k int, {a} int, {b[0]} date, {b[1]} date",
        )

    # intervals chosen to cross 7-day buckets, span several buckets,
    # share a bucket without overlapping, and repeat across keys
    cover_rows = [
        (1, 0, 3), (1, 2, 30), (1, 10, 12), (2, 0, 1), (2, 5, 40),
    ]
    probe_rows = [
        (1, 1, 2), (1, 4, 6), (1, 13, 13), (1, 31, 35), (2, 39, 45),
        (3, 0, 9),
    ]
    cover = mk(cover_rows, "ca", ("c0", "c1"))
    probe = mk(probe_rows, "pa", ("p0", "p1"))
    got = {
        (r.k, r.ca, r.pa)
        for r in range_join(
            cover, probe, ["k"], ("c0", "c1"), ("p0", "p1"), bucket_days=7
        ).collect()
    }
    want = {
        (ck, ci, pi)
        for ci, (ck, cs, ce) in enumerate(cover_rows)
        for pi, (pk, ps, pe) in enumerate(probe_rows)
        if ck == pk and cs <= pe and ps <= ce and cs <= ps
    }
    assert got == want and want  # non-trivial fixture
    # duplicate-free by construction (probe contributes ONE bucket)
    joined = range_join(
        cover, probe, ["k"], ("c0", "c1"), ("p0", "p1"), bucket_days=7
    )
    assert joined.count() == joined.distinct().count() == len(want)


def test_window_funnel_depths_per_key(spark):
    """ClickHouse windowFunnel semantics on a hand-built fixture: the
    window anchors at the FIRST step-1 event, each step fires strictly
    after the previous one, out-of-order prefixes don't count, and keys
    that never fire step 1 report depth 0."""
    import datetime as dt

    from stream_processing_pipeline_spark.operators.aggregates import (
        window_funnel,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1: full funnel inside the hour -> 3
        (1, "view", at(0)), (1, "click", at(10)), (1, "purchase", at(50)),
        # u2: purchase lands past the hour from FIRST view -> 2
        (2, "view", at(0)), (2, "click", at(30)), (2, "purchase", at(61)),
        # u3: click precedes the first view (out of order) -> 1
        (3, "click", at(0)), (3, "view", at(5)),
        # u4: no view at all -> 0
        (4, "click", at(0)), (4, "purchase", at(1)),
        # u5: second view would fit, but the window anchors at the FIRST
        # view, so the click at +70min is out -> 1
        (5, "view", at(0)), (5, "view", at(30)), (5, "click", at(70)),
        # u6: same-timestamp click must NOT fire (strictly after) -> 1
        (6, "view", at(0)), (6, "click", at(0)),
    ]
    ev = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    got = {
        r.user_id: r.depth
        for r in window_funnel(
            ev,
            steps=[
                F.col("event_type") == "view",
                F.col("event_type") == "click",
                F.col("event_type") == "purchase",
            ],
            window="INTERVAL 1 HOUR",
        ).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1, 6: 1}


def test_asof_join_matches_pandas_merge_asof(spark):
    """The union+window as-of join must equal pandas merge_asof on random
    keyed data in all four (direction, allow_exact_matches) modes, and the
    payload struct must stay ATOMIC (all matched columns from one right
    row) when payload values are NULL."""
    import numpy as np
    import pandas as pd

    from stream_processing_pipeline_spark.operators.joins import asof_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {"k": rng.integers(0, 4, 60), "t": rng.integers(0, 50, 60),
         "lid": np.arange(60)}
    ).sort_values("t", kind="stable").reset_index(drop=True)
    right = pd.DataFrame(
        {"k": rng.integers(0, 4, 40), "t": rng.integers(0, 50, 40),
         "v": rng.integers(100, 200, 40)}
    ).sort_values("t", kind="stable")
    # dedupe right on (k, t): merge_asof's within-tie pick is otherwise
    # unspecified and the comparison would be ill-posed
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    L, R = spark.createDataFrame(left), spark.createDataFrame(right)
    for direction in ("backward", "forward"):
        for exact in (True, False):
            got = (
                asof_join(L, R, ["k"], ["t"], ["v"], direction, exact)
                .toPandas().sort_values("lid").reset_index(drop=True)
            )
            want = pd.merge_asof(
                left.sort_values("t"), right.sort_values("t"),
                on="t", by="k", direction=direction,
                allow_exact_matches=exact,
            ).sort_values("lid").reset_index(drop=True)
            assert got["v"].astype("float64").equals(
                want["v"].astype("float64")
            ), (direction, exact)

    # atomicity: two payload columns, one nullable — both must come from
    # the SAME matched right row, not the last non-null of each
    r2 = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1], "t": [10, 20],
             "price": [5, 7], "note": ["early", None]}
        )
    )
    l2 = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [30]}))
    (row,) = asof_join(
        l2, r2, ["k"], ["t"], ["price", "note"]
    ).collect()
    assert (row.price, row.note) == (7, None)  # NOT (7, "early")


def test_window_funnel_fuzz_300_scenarios_one_spark_job(spark):
    """300 seeded-random event sequences (types, duplicate timestamps,
    empty prefixes, out-of-order steps) evaluated in ONE Spark job — each
    scenario is its own funnel key — against a direct Python model of the
    ClickHouse semantics (anchor at first step-1, strictly-after
    chaining, window from the anchor)."""
    import random

    from stream_processing_pipeline_spark.operators.aggregates import (
        window_funnel,
    )

    rng = random.Random(1234)
    types = ["view", "click", "purchase", "other"]
    rows, expected = [], {}
    for sid in range(300):
        n = rng.randint(1, 12)
        evs = sorted(
            (rng.randint(0, 120), rng.choice(types)) for _ in range(n)
        )
        for t, ty in evs:
            rows.append((sid, ty, t))
        # python reference: minutes, window = 60
        def first_at(cond, after, bound):
            c = [t for t, ty in evs if cond(ty) and t > after and t <= bound]
            return min(c) if c else None

        t1c = [t for t, ty in evs if ty == "view"]
        depth = 0
        if t1c:
            t1 = min(t1c)
            depth = 1
            t2 = first_at(lambda ty: ty == "click", t1, t1 + 60)
            if t2 is not None:
                depth = 2
                t3 = first_at(lambda ty: ty == "purchase", t2, t1 + 60)
                if t3 is not None:
                    depth = 3
        expected[sid] = depth

    df = spark.createDataFrame(
        [(sid, ty, float(t)) for sid, ty, t in rows],
        "user_id int, event_type string, mins double",
    ).select(
        "user_id", "event_type",
        F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,CAST(mins AS INT),0)").alias("ts"),
    )
    got = {
        r.user_id: r.depth
        for r in window_funnel(
            df,
            steps=[
                F.col("event_type") == "view",
                F.col("event_type") == "click",
                F.col("event_type") == "purchase",
            ],
            window="INTERVAL 1 HOUR",
        ).collect()
    }
    assert got == expected


def test_range_join_fuzz_200_scenarios_one_spark_job(spark):
    """200 seeded-random interval sets (boundary-touching, nested,
    disjoint, multi-bucket-spanning, same-start) through range_join in
    ONE Spark job — scenario id rides as an extra equi-key — against the
    brute-force overlap definition."""
    import datetime as dt
    import random

    from stream_processing_pipeline_spark.operators.joins import range_join

    rng = random.Random(77)
    d0 = dt.date(2024, 1, 1)
    cover_rows, probe_rows = [], []
    want = set()
    for sid in range(200):
        nc, np_ = rng.randint(1, 5), rng.randint(1, 5)
        cov = []
        for i in range(nc):
            s = rng.randint(0, 90)
            cov.append((i, s, s + rng.randint(0, 45)))
            cover_rows.append((sid, i, d0 + dt.timedelta(days=cov[-1][1]),
                               d0 + dt.timedelta(days=cov[-1][2])))
        for j in range(np_):
            s = rng.randint(0, 90)
            e = s + rng.randint(0, 45)
            probe_rows.append((sid, j, d0 + dt.timedelta(days=s),
                               d0 + dt.timedelta(days=e)))
            for (i, cs, ce) in cov:
                if cs <= e and s <= ce and cs <= s:
                    want.add((sid, i, j))
    cover = spark.createDataFrame(
        cover_rows, "sid int, ca int, c0 date, c1 date"
    )
    probe = spark.createDataFrame(
        probe_rows, "sid int, pa int, p0 date, p1 date"
    )
    out = range_join(
        cover, probe, ["sid"], ("c0", "c1"), ("p0", "p1"), bucket_days=7
    )
    got = {(r.sid, r.ca, r.pa) for r in out.collect()}
    assert got == want and len(want) > 200
    assert out.count() == len(got)  # exactly-once capture, no dup rows


def test_range_join_timestamp_and_numeric_axes_fuzz(spark):
    """VERDICT r7 #3: the generalized bucket axes must reproduce the
    brute-force overlap set exactly. 200 seeded-random scenarios per
    axis ride a scenario-id equi-key through ONE Spark job each:
    TIMESTAMP intervals (second-resolution, 1-hour buckets, including
    bucket-boundary touches) and signed NUMERIC intervals (negative
    coordinates straddling zero, where truncating `div` makes the
    zero bucket 2W-1 wide — more candidates, same exact result)."""
    import datetime as dt
    import random

    from stream_processing_pipeline_spark.operators.joins import range_join

    # ---- timestamp axis: starts within ~3 days, lengths 0..8h ----
    rng = random.Random(88)
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    cover_rows, probe_rows, want = [], [], set()
    for sid in range(200):
        cov = []
        for i in range(rng.randint(1, 5)):
            s = rng.randint(0, 3 * 86400)
            e = s + rng.randint(0, 8 * 3600)
            cov.append((i, s, e))
            cover_rows.append(
                (sid, i, t0 + dt.timedelta(seconds=s),
                 t0 + dt.timedelta(seconds=e))
            )
        for j in range(rng.randint(1, 5)):
            s = rng.randint(0, 3 * 86400)
            e = s + rng.randint(0, 8 * 3600)
            probe_rows.append(
                (sid, j, t0 + dt.timedelta(seconds=s),
                 t0 + dt.timedelta(seconds=e))
            )
            for (i, cs, ce) in cov:
                if cs <= e and s <= ce and cs <= s:
                    want.add((sid, i, j))
    cover = spark.createDataFrame(
        cover_rows, "sid int, ca int, c0 timestamp, c1 timestamp"
    )
    probe = spark.createDataFrame(
        probe_rows, "sid int, pa int, p0 timestamp, p1 timestamp"
    )
    out = range_join(
        cover, probe, ["sid"], ("c0", "c1"), ("p0", "p1"),
        interval_unit="timestamp", bucket_width=3600,
    )
    got = {(r.sid, r.ca, r.pa) for r in out.collect()}
    assert got == want and len(want) == 101  # seeded: non-trivial fixture
    assert out.count() == len(got)  # exactly-once, no dup rows

    # ---- numeric axis: signed coordinates in [-500, 500] ----
    rng = random.Random(99)
    cover_rows, probe_rows, want = [], [], set()
    for sid in range(200):
        cov = []
        for i in range(rng.randint(1, 5)):
            s = rng.randint(-500, 500)
            e = s + rng.randint(0, 120)
            cov.append((i, s, e))
            cover_rows.append((sid, i, s, e))
        for j in range(rng.randint(1, 5)):
            s = rng.randint(-500, 500)
            e = s + rng.randint(0, 120)
            probe_rows.append((sid, j, s, e))
            for (i, cs, ce) in cov:
                if cs <= e and s <= ce and cs <= s:
                    want.add((sid, i, j))
    cover = spark.createDataFrame(
        cover_rows, "sid int, ca int, c0 long, c1 long"
    )
    probe = spark.createDataFrame(
        probe_rows, "sid int, pa int, p0 long, p1 long"
    )
    out = range_join(
        cover, probe, ["sid"], ("c0", "c1"), ("p0", "p1"),
        interval_unit="numeric", bucket_width=50,
    )
    got = {(r.sid, r.ca, r.pa) for r in out.collect()}
    assert got == want and len(want) == 95  # seeded: non-trivial fixture
    assert out.count() == len(got)

    # contract: non-date axes demand an explicit width; junk unit rejects
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bucket_width"):
        range_join(cover, probe, ["sid"], ("c0", "c1"), ("p0", "p1"),
                   interval_unit="numeric")
    with _pytest.raises(ValueError, match="interval_unit"):
        range_join(cover, probe, ["sid"], ("c0", "c1"), ("p0", "p1"),
                   interval_unit="hours")


def test_window_funnel_modes_fuzz_300_scenarios(spark):
    """VERDICT r7 #5: strict_dedup / strict_order modes, fuzz-verified.
    300 seeded-random event sequences (overlapping step predicates so one
    event can match two conditions, duplicate timestamps for the tie
    rule, interlopers) run through window_funnel once per mode
    configuration in ONE Spark job each, against an independent Python
    model of the documented semantics matrix (fixed anchor; breaker
    interrupts only when STRICTLY earlier than the candidate)."""
    import random

    from stream_processing_pipeline_spark.operators.aggregates import (
        window_funnel,
    )

    # predicate sets overlap on 'promo' so matches can tie with breakers
    COND_TYPES = [
        {"view", "promo"},
        {"click", "promo"},
        {"purchase"},
    ]
    types = ["view", "click", "purchase", "promo", "other"]
    rng = random.Random(4321)
    rows, scen = [], {}
    for sid in range(300):
        n = rng.randint(1, 14)
        evs = sorted(
            (rng.randint(0, 120), rng.choice(types)) for _ in range(n)
        )
        scen[sid] = evs
        for t, ty in evs:
            rows.append((sid, ty, t))

    def model(evs, modes, W=60):
        t1c = [t for t, ty in evs if ty in COND_TYPES[0]]
        if not t1c:
            return 0
        t1 = min(t1c)
        depth, prev = 1, t1
        for i in range(1, len(COND_TYPES)):
            bound = t1 + W
            cands = [
                t for t, ty in evs if ty in COND_TYPES[i] and prev < t <= bound
            ]
            if not cands:
                return depth
            ti = min(cands)
            if "strict_order" in modes:
                brk_set = set().union(
                    *(c for j, c in enumerate(COND_TYPES) if j != i)
                )
                brks = [t for t, ty in evs if ty in brk_set and prev < t <= bound]
            elif "strict_dedup" in modes:
                brks = [
                    t for t, ty in evs
                    if ty in COND_TYPES[i - 1] and prev < t <= bound
                ]
            else:
                brks = []
            if brks and min(brks) < ti:
                return depth
            depth, prev = i + 1, ti
        return depth

    df = spark.createDataFrame(
        [(sid, ty, float(t)) for sid, ty, t in rows],
        "user_id int, event_type string, mins double",
    ).select(
        "user_id", "event_type",
        F.expr(
            "timestamp '2024-01-01 00:00:00'"
            " + make_interval(0,0,0,0,0,CAST(mins AS INT),0)"
        ).alias("ts"),
    )
    steps = [
        F.col("event_type").isin(*sorted(c)) for c in COND_TYPES
    ]
    for modes in ((), ("strict_dedup",), ("strict_order",),
                  ("strict_dedup", "strict_order")):
        got = {
            r.user_id: r.depth
            for r in window_funnel(
                df, steps=steps, window="INTERVAL 1 HOUR", modes=modes
            ).collect()
        }
        want = {sid: model(evs, modes) for sid, evs in scen.items()}
        diff = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
        assert not diff, (modes, dict(list(diff.items())[:5]))
        # the fixture must actually exercise the mode (some scenario
        # diverges from the default semantics)
        if modes:
            base = {sid: model(evs, ()) for sid, evs in scen.items()}
            assert any(want[k] != base[k] for k in want), modes

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown window_funnel modes"):
        window_funnel(df, steps=steps, window="INTERVAL 1 HOUR",
                      modes=("strict_monotone",))


def test_sequence_match_fuzz_300_scenarios(spark):
    """sequence_match (any-anchor existence with adjacency gap guards) vs
    a brute-force forward-closure model. 300 seeded-random scenarios in
    ONE Spark job per gap configuration; fixtures include the case that
    kills a greedy earliest-chain implementation (early step-1 anchor too
    old for every step-2 event a later anchor reaches) plus duplicate
    timestamps (equal ts must never chain)."""
    import random

    from stream_processing_pipeline_spark.operators.aggregates import (
        sequence_match,
    )

    types = ["view", "click", "purchase", "other"]
    rng = random.Random(5150)
    rows, scen = [], {}
    for sid in range(300):
        n = rng.randint(1, 14)
        evs = sorted(
            (rng.randint(0, 120), rng.choice(types)) for _ in range(n)
        )
        scen[sid] = evs
        for t, ty in evs:
            rows.append((sid, ty, t))
    # hand-planted greedy-killer: step1@0 (too old), step1@50, step2@70
    scen[1000] = [(0, "view"), (50, "view"), (70, "click"), (71, "purchase")]
    # equal-ts non-chain: view and click at the same instant
    scen[1001] = [(10, "view"), (10, "click"), (11, "purchase")]
    for sid in (1000, 1001):
        rows += [(sid, ty, t) for t, ty in scen[sid]]

    def model(evs, gaps_min):
        conds = ["view", "click", "purchase"]
        reach = [t for t, ty in evs if ty == conds[0]]
        for ci, g in zip(conds[1:], gaps_min):
            nxt = []
            for t, ty in evs:
                if ty != ci:
                    continue
                ok = any(
                    p < t and (g is None or t - p <= g) for p in reach
                )
                if ok:
                    nxt.append(t)
            reach = nxt
        return 1 if reach else 0

    df = spark.createDataFrame(
        [(sid, ty, float(t)) for sid, ty, t in rows],
        "user_id int, event_type string, mins double",
    ).select(
        "user_id", "event_type",
        F.expr(
            "timestamp '2024-01-01 00:00:00'"
            " + make_interval(0,0,0,0,0,CAST(mins AS INT),0)"
        ).alias("ts"),
    )
    steps = [F.col("event_type") == t for t in ("view", "click", "purchase")]
    for gaps_min in ((30, 30), (None, 30), (None, None), (25, None)):
        gaps_sec = [None if g is None else g * 60 for g in gaps_min]
        got = {
            r.user_id: r.matched
            for r in sequence_match(df, steps, gaps_sec).collect()
        }
        want = {sid: model(evs, gaps_min) for sid, evs in scen.items()}
        diff = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
        assert not diff, (gaps_min, dict(list(diff.items())[:5]))
        assert 0 < sum(want.values()) < len(want), gaps_min  # non-trivial
    # the greedy-killer must match under (30, 30): anchor@50 -> 70 -> 71
    assert model(scen[1000], (30, 30)) == 1
    # equal-ts must NOT satisfy view->click adjacency: the only click is
    # at the view's own timestamp, and strict ordering forbids chaining it
    assert model(scen[1001], (1, 30)) == 0


def test_sequence_count_fuzz_300_scenarios(spark):
    """sequence_count (non-overlapping greedy match counting) vs a
    brute-force model that literally enumerates EVERY chain and loops
    min-completion -> advance-floor — independent of the operator's
    latest-witness DP. 300 seeded-random scenarios in ONE Spark job per
    configuration; hand fixtures cover the greedy-killer anchor case,
    equal-timestamp non-chaining, overlapping step predicates (one event
    satisfying several steps), and multi-match streams."""
    import random

    from stream_processing_pipeline_spark.operators.aggregates import (
        sequence_count,
    )

    types = ["view", "click", "purchase", "other"]
    rng = random.Random(6160)
    rows, scen = [], {}
    for sid in range(300):
        n = rng.randint(1, 14)
        evs = sorted(
            (rng.randint(0, 120), rng.choice(types)) for _ in range(n)
        )
        scen[sid] = evs
        for t, ty in evs:
            rows.append((sid, ty, t))
    scen[1000] = [(0, "view"), (50, "view"), (70, "click"), (71, "purchase")]
    scen[1001] = [(10, "view"), (10, "click"), (11, "purchase")]
    # dense alternating stream: several non-overlapping full chains
    scen[1002] = [
        (t, ty)
        for i in range(5)
        for t, ty in (
            (20 * i, "view"),
            (20 * i + 3, "click"),
            (20 * i + 6, "purchase"),
        )
    ]
    for sid in (1000, 1001, 1002):
        rows += [(sid, ty, t) for t, ty in scen[sid]]

    def brute_count(evs, conds, gaps_min):
        def completions(floor):
            comps = []

            def rec(j, prev_t):
                if j == len(conds):
                    comps.append(prev_t)
                    return
                for t, ty in evs:
                    if t <= floor or not conds[j](ty):
                        continue
                    if j > 0:
                        if t <= prev_t:
                            continue
                        g = gaps_min[j - 1]
                        if g is not None and t - prev_t > g:
                            continue
                    rec(j + 1, t)

            rec(0, None)
            return comps

        floor, count = -1, 0
        while True:
            comps = completions(floor)
            if not comps:
                return count
            floor = min(comps)
            count += 1

    df = spark.createDataFrame(
        [(sid, ty, float(t)) for sid, ty, t in rows],
        "user_id int, event_type string, mins double",
    ).select(
        "user_id", "event_type",
        F.expr(
            "timestamp '2024-01-01 00:00:00'"
            " + make_interval(0,0,0,0,0,CAST(mins AS INT),0)"
        ).alias("ts"),
    )
    cfgs = [
        # (spark step cols, model predicates, gaps in minutes)
        (
            [F.col("event_type") == t for t in ("view", "click", "purchase")],
            [lambda ty: ty == "view", lambda ty: ty == "click",
             lambda ty: ty == "purchase"],
            (30, 30),
        ),
        (
            [F.col("event_type") == t for t in ("view", "click", "purchase")],
            [lambda ty: ty == "view", lambda ty: ty == "click",
             lambda ty: ty == "purchase"],
            (None, 30),
        ),
        (
            [F.col("event_type") == "view", F.col("event_type") == "purchase"],
            [lambda ty: ty == "view", lambda ty: ty == "purchase"],
            (None,),
        ),
        # overlapping predicates: step 1 matches view OR click, step 2
        # matches click — one event can satisfy both steps
        (
            [F.col("event_type").isin("view", "click"),
             F.col("event_type") == "click"],
            [lambda ty: ty in ("view", "click"), lambda ty: ty == "click"],
            (45,),
        ),
    ]
    for step_cols, conds, gaps_min in cfgs:
        gaps_sec = [None if g is None else g * 60 for g in gaps_min]
        got = {
            r.user_id: r.n_matches
            for r in sequence_count(df, step_cols, gaps_sec).collect()
        }
        want = {
            sid: brute_count(evs, conds, gaps_min)
            for sid, evs in scen.items()
        }
        diff = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
        assert not diff, (gaps_min, dict(list(diff.items())[:5]))
        assert max(want.values()) >= 2, gaps_min  # multi-match coverage
        assert min(want.values()) == 0, gaps_min  # zero-match coverage
    # pinned: the dense alternating stream yields exactly 5 disjoint
    # chains under (30, 30)
    assert brute_count(
        scen[1002],
        [lambda ty: ty == "view", lambda ty: ty == "click",
         lambda ty: ty == "purchase"],
        (30, 30),
    ) == 5


def test_attribution_credits_conserve_purchase_cents(spark):
    """revenue_attribution_ushaped's integer split must conserve money
    EXACTLY: summed channel credits == summed purchase cents (no float
    leakage, no remainder loss), and the direct channel carries exactly
    the zero-touch purchases."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.functions.money import cents
    from stream_processing_pipeline_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    out = REGISTRY["revenue_attribution_ushaped"].fn(spark, sf).collect()
    ev = spark.read.parquet(f"{sf}/events.parquet")
    total = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum(cents("value")))
        .first()[0]
    )
    assert sum(r.credited_cents for r in out) == total
    direct = {r.channel: r for r in out}["direct"]
    assert direct.n_touches == 0 and direct.n_purchases > 0
