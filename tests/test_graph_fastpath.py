"""Round-12 graph fast path: basket-edge posting-array form vs legacy.

The co-purchase edge build (part_affinity_triangles, kcore_part_affinity)
moved from distinct -> row_number basket cap -> order-keyed self-join
(four exchanges) to one collect_set/array_sort/slice aggregation with
in-array pair enumeration (two exchanges) — plans/batch._basket_edges.
These tests prove the two forms row-identical, INCLUDING the cap
truncation semantics the fixtures never exercise (TPC-H baskets <= 7),
on a synthetic over-cap basket.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.plans.batch import _basket_edges

SF = "/root/testdata/sf0.001"


def _legacy_edges(li, cap: int, support: int):
    """The pre-r12 chain, verbatim: distinct -> windowed basket cap ->
    order-keyed self-join -> support filter."""
    wb = Window.partitionBy("o").orderBy("p")
    op = (
        li.distinct()
        .withColumn("rn_", F.row_number().over(wb))
        .filter(F.col("rn_") <= cap)
        .drop("rn_")
    )
    a = op.select("o", F.col("p").alias("x"))
    b = op.select(F.col("o").alias("o2"), F.col("p").alias("y"))
    return (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("x") < F.col("y")))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= support)
        .select("x", "y")
    )


def test_basket_edges_match_legacy_on_fixture(spark):
    """Array form == legacy self-join form on the real lineitem projection
    (cap a no-op here — baskets <= 7 — so this pins the dedup + pair +
    support semantics)."""
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
    )
    got = sorted(map(tuple, _basket_edges(li, 32, 2).collect()))
    want = sorted(map(tuple, _legacy_edges(li, 32, 2).collect()))
    assert got == want
    assert len(got) > 0  # non-vacuous: the fixture graph has edges


def test_basket_edges_cap_truncation_matches_legacy(spark):
    """A synthetic 40-part bot-cart order plus duplicate (o, p) rows:
    the cap must keep the cap partkey-SMALLEST items (row_number over
    ORDER BY p semantics), not an arbitrary subset, and collect_set must
    reproduce the legacy DISTINCT. cap=5 so truncation actually fires."""
    random.seed(7)
    rows = []
    # one over-cap order with shuffled inserts and duplicates
    parts = random.sample(range(1000), 40)
    for p in parts + parts[:10]:
        rows.append((1, p))
    # a few normal baskets sharing some parts (to cross the support=2 bar)
    for o, basket in [(2, parts[:3]), (3, parts[:3]), (4, [1, 2]), (5, [1, 2])]:
        rows.extend((o, p) for p in basket)
    li = spark.createDataFrame(rows, "o long, p long")
    got = sorted(map(tuple, _basket_edges(li, 5, 2).collect()))
    want = sorted(map(tuple, _legacy_edges(li, 5, 2).collect()))
    assert got == want
    assert len(got) > 0
