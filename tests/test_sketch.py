"""Misra-Gries heavy hitters + Morton z-ordering (operators/sketch.py).

The fixture vocabulary is small (31 tokens at every SF), so the registry
query never triggers MG eviction; these tests construct a skewed stream
with cardinality >> k so the eviction path and the no-false-negative
guarantee are exercised for real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.operators.sketch import (
    heavy_hitters_exact,
    mg_candidates,
    morton_interleave,
    morton_sql,
)

from .conftest import SF_MED


def _skewed_df(spark, n_partitions: int = 4):
    """~5.5k rows, 1000+ distinct keys: three heavy keys own ~38% of the
    mass, a 1000-key uniform tail owns the rest — eviction fires constantly
    for any k well under 1000."""
    rows = (
        [("hot_a",)] * 1200
        + [("hot_b",)] * 700
        + [("hot_c",)] * 300
        + [(f"tail_{i % 1000}",) for i in range(3333)]
    )
    # Deterministic interleave so heavy keys appear in every partition mixed
    # with tail keys (the adversarial order for a counter-based sketch).
    rows.sort(key=lambda r: hash(r[0] + str(len(r))) % 97)
    return spark.createDataFrame(rows, "key string").repartition(n_partitions)


def test_mg_candidates_bounded_and_superset(spark):
    k = 20
    df = _skewed_df(spark)
    n_total = df.count()
    out = mg_candidates(df, "key", k).collect()

    totals = [r.n for r in out if r.key is None]
    cands = [r for r in out if r.key is not None]
    # One total row per partition; together they reconstruct N exactly.
    assert sum(totals) == n_total
    # Bounded output: at most k candidate rows per partition.
    assert len(cands) <= k * len(totals)

    # No-false-negative guarantee: every key with global count > N/(k+1)
    # survives in at least one partition's summary.
    exact = {r.key: r.n for r in df.groupBy("key").count().withColumnRenamed("count", "n").collect()}
    must_survive = {key for key, n in exact.items() if n > n_total / (k + 1)}
    survived = {r.key for r in cands}
    assert must_survive  # the fixture really has heavy keys
    assert must_survive <= survived
    # MG counters are lower bounds on the true count.
    for r in cands:
        assert r.n <= exact[r.key]


def test_heavy_hitters_exact_equals_naive(spark):
    phi_den = 8  # heavy := count*8 >= N; hot_a and hot_b qualify, tail not
    df = _skewed_df(spark)
    n_total = df.count()
    got = {
        (r.key, r.n)
        for r in heavy_hitters_exact(df, "key", phi_den=phi_den, k=20).collect()
    }
    naive = {
        (r.key, r["count"])
        for r in df.groupBy("key").count().collect()
        if r["count"] * phi_den >= n_total
    }
    assert got == naive
    assert {k for k, _ in got} == {"hot_a", "hot_b"}


def test_heavy_hitters_guard_rejects_weak_k(spark):
    df = _skewed_df(spark, n_partitions=1)
    with pytest.raises(ValueError, match="superset guarantee"):
        heavy_hitters_exact(df, "key", phi_den=30, k=10)


def test_heavy_hitters_plan_shape(spark):
    """Phase 1 is one Arrow-batched python stage; phase 2's recount joins
    broadcast candidates (no shuffle of the candidate set)."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    df = REGISTRY["heavy_hitters_tokens"].fn(spark, SF_MED)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "MapInPandas" in plan
    assert "Broadcast" in plan


def test_cms_overestimates_and_is_bounded(spark):
    """CMS estimates dominate the exact counts (counters only gain mass),
    are exact when min sees a collision-free row, and the sketch itself
    never exceeds depth*width cells regardless of key cardinality."""
    from stream_processing_pipeline_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    depth, width = 4, 64
    df = _skewed_df(spark)
    exact = {r.key: r["count"] for r in df.groupBy("key").count().collect()}

    counters = cms_counters(df, "key", depth, width)
    cells = counters.collect()
    assert len(cells) <= depth * width
    # Cell-wise mass conservation: every hash row saw every input row once.
    n_total = df.count()
    mass = {}
    for c in cells:
        mass[c.row] = mass.get(c.row, 0) + c.n
    assert mass == {r: n_total for r in range(depth)}

    keys = df.select("key").distinct()
    est = {
        r.key: r.cms_n
        for r in cms_estimate(counters, keys, "key", depth, width).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # With 1000+ keys in 64 buckets the tail is noisy, but the heavy keys
    # tower over the collision noise: their estimates stay within N/width
    # per the CMS bound often enough that at least the argmax survives.
    assert max(est, key=est.get) == "hot_a"


def test_cms_merge_is_cellwise_addition(spark):
    """Sketching two disjoint halves and adding cells equals sketching the
    union — the mergeability contract that makes CMS shard-parallel."""
    from stream_processing_pipeline_spark.operators.sketch import cms_counters

    depth, width = 3, 32
    df = _skewed_df(spark).withColumn(
        "half", (F.length("key") % 2).cast("int")
    )
    whole = {
        (r.row, r.bucket): r.n
        for r in cms_counters(df, "key", depth, width).collect()
    }
    merged: dict[tuple[int, int], int] = {}
    for h in (0, 1):
        part = cms_counters(df.filter(F.col("half") == h), "key", depth, width)
        for r in part.collect():
            merged[(r.row, r.bucket)] = merged.get((r.row, r.bucket), 0) + r.n
    assert merged == whole


def test_cms_registry_query_head_is_near_exact(spark):
    """The registered query's head tokens: estimates dominate exact counts,
    and the 4x256 grid keeps the head collision error small on the fixture
    corpus (the oracle pins the exact values; this pins the semantics)."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    rows = REGISTRY["cms_token_freq"].fn(spark, SF_MED).collect()
    assert len(rows) == 20
    assert all(r.cms_n >= r.exact_n for r in rows)


def test_morton_bijective_and_block_aligned(spark):
    """All 1024 (x, y) pairs get distinct codes, and chopping the low 6
    bits yields 16 aligned 8x8 rectangles — the file-skipping property the
    layout query's docstring claims."""
    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    coded = grid.select(
        "x", "y", morton_interleave(F.col("x"), F.col("y"), 5).alias("z")
    )
    rows = coded.collect()
    assert len({r.z for r in rows}) == 1024
    assert all(0 <= r.z < 1024 for r in rows)
    blocks: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        blocks.setdefault(r.z >> 6, []).append((r.x, r.y))
    assert len(blocks) == 16
    for pts in blocks.values():
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert len(pts) == 64
        assert max(xs) - min(xs) == 7 and max(ys) - min(ys) == 7
        assert min(xs) % 8 == 0 and min(ys) % 8 == 0


def test_morton_sql_twin_matches_column_form(spark):
    import duckdb

    pairs = [(x, y) for x in range(0, 32, 5) for y in range(0, 24, 7)]
    sdf = spark.createDataFrame(pairs, "x long, y long")
    spark_codes = {
        (r.x, r.y): r.z
        for r in sdf.select(
            "x", "y", morton_interleave(F.col("x"), F.col("y"), 5).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    sql = morton_sql("x", "y", 5)
    for x, y in pairs:
        (got,) = con.execute(
            f"SELECT {sql} FROM (SELECT {x}::BIGINT AS x, {y}::BIGINT AS y)"
        ).fetchone()
        assert got == spark_codes[(x, y)]


def test_zorder_layout_narrows_file_spans(spark):
    """Every 64-code file covers an 8-wide slice of BOTH dimensions on the
    real fixture — the min/max stats a reader prunes 2-D predicates on."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    stats = REGISTRY["layout_zorder_stats"].fn(spark, SF_MED).collect()
    assert stats
    for r in stats:
        assert r.max_x - r.min_x <= 7
        assert r.max_y - r.min_y <= 7
        assert r.min_x // 8 == r.max_x // 8  # aligned, not merely narrow
        assert r.min_y // 8 == r.max_y // 8


def test_weighted_priority_sample_prefers_long_documents(spark):
    """Selection odds scale with the token-count weight: the picked docs'
    mean length must exceed the corpus mean (deterministic on the fixture,
    k=100 of 500 docs at sf0.01)."""
    from stream_processing_pipeline_spark.operators.text import token_count
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    picked = REGISTRY["weighted_priority_sample"].fn(spark, SF_MED)
    rows = picked.collect()
    assert len(rows) == 100
    corpus_mean = (
        catalog(spark, SF_MED)
        .documents.select(F.avg(token_count("text")).alias("m"))
        .collect()[0]
        .m
    )
    sample_mean = sum(r.n_tokens for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_zorder_written_files_have_narrow_footer_stats(spark, tmp_path):
    """The actual write path: sort by zcode, cut files, then read the REAL
    parquet footer min/max back with pyarrow — the stats a reader prunes on
    — and compare against an unsorted (hash-layout) write of the same data.
    Z-ordered files must bound BOTH dimensions tightly; the hash layout
    bounds neither."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, StructField, StructType  # noqa: F401

    from stream_processing_pipeline_spark.plans.common import catalog

    ev = catalog(spark, SF_MED).events
    x = (F.col("user_id") % 32).cast("long")
    y = F.hour("ts").cast("long")
    coded = ev.select(
        x.alias("x"), y.alias("y"),
        morton_interleave(x, y, 5).alias("zcode"),
    )

    def footer_spans(d: str) -> dict[str, list[int]]:
        spans: dict[str, list[int]] = {"x": [], "y": []}
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for name in ("x", "y"):
                idx = md.schema.names.index(name)
                los, his = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    los.append(st.min)
                    his.append(st.max)
                spans[name].append(max(his) - min(los))
        return spans

    zdir = str(tmp_path / "zorder")
    (coded.repartition(1).sortWithinPartitions("zcode")
     .write.option("maxRecordsPerFile", 640).parquet(zdir))
    hdir = str(tmp_path / "hashed")
    coded.repartition(4, "x").write.parquet(hdir)

    z, h = footer_spans(zdir), footer_spans(hdir)
    assert len(z["x"]) >= 8  # enough files for the claim to mean something

    def pct75(vals: list[int]) -> int:
        return sorted(vals)[(3 * len(vals)) // 4]

    # Z-ordered files tightly bound BOTH dimensions (a sparse tail file may
    # jump an unoccupied code range — hours only span 0-23 of the 0-31 grid
    # — so the claim is distributional, not worst-case)...
    assert pct75(z["x"]) <= 15 and pct75(z["y"]) <= 9
    # ...while hash-by-x layout leaves y completely unbounded in EVERY file
    # and doesn't even bound its own partition column within a file.
    assert min(h["y"]) >= 20
    assert sum(z["x"]) / len(z["x"]) < sum(h["x"]) / len(h["x"])
    assert sum(z["y"]) / len(z["y"]) < sum(h["y"]) / len(h["y"])


def test_power_iteration_captures_top_variance(spark):
    """Invariant vs numpy: the fixture spectrum is nearly flat
    (lambda1/lambda2 = 1.013 — direction convergence is hopeless by
    design), so the pinned guarantee is CAPTURED VARIANCE: the Rayleigh
    quotient of the returned direction must reach 0.9 of the true top
    eigenvalue (the all-ones seed starts at ~0.48), computed on the same
    integer-centered matrix the query iterates on."""
    import numpy as np
    import pyarrow.parquet as pq

    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    rows = REGISTRY["emb_top_pc_power_iteration"].fn(spark, SF_MED).collect()
    w = np.array([r.w for r in sorted(rows, key=lambda r: r.dim_idx)], float)

    X = np.array(
        pq.read_table(f"{SF_MED}/embeddings.parquet")
        .column("embedding").to_pylist(), float,
    )
    m = np.floor(X * 1000 + 0.5)
    c = m - np.trunc(m.sum(axis=0) / len(m))
    cov = c.T @ c
    l1 = np.linalg.eigvalsh(cov)[-1]
    rayleigh = (w @ cov @ w) / (w @ w)
    seed = np.ones(64)
    seed_r = (seed @ cov @ seed) / 64
    assert rayleigh / l1 >= 0.9, rayleigh / l1
    assert rayleigh > seed_r  # the iterations actually moved it
