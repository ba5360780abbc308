"""Celebrity-key probe for the r12 exactly-once orientation filter.

The interval self-join queries (supplier_part_transit_overlaps,
customer_inflight_order_overlaps) replaced their pair-output-grain
DISTINCT with an orientation filter (strictly-earlier cover start,
tuple tie-break at equal starts) in round 12. At fixture pair volumes
the change measured wall-NEUTRAL (~1.6k pairs — the plan's big exchange
is the bucket join); the claim that justified it was STRUCTURAL: a hot
equi-key makes pair output quadratic-sized exactly where a DISTINCT
exchange is most expensive, while the filter costs O(1) per row where
candidates are born.

This probe plants that hot key and measures the claim: ONE (s, p) with
``K`` mutually-overlapping intervals (K=3000 -> ~4.5M unordered pairs)
over 100k cold-key background rows, then times the legacy
DISTINCT-collapse tail against the orientation-filter tail on the same
``range_join`` candidates. Measured 2026-08-17, local[32], quiet
window (loadavg < 1): identical 4,498,500 rows, legacy 7.89/8.16 s vs
filter 0.81/0.76 s — ~10x, all of it the avoided pair-grain exchange
(SCALING.md "Interval self-joins at celebrity keys").

Usage: python tools/r12_celebrity_pair_probe.py [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators.joins import (
        interval_overlap_days,
        normalized_pair_cols,
        range_join,
    )
    from stream_processing_pipeline_spark.session import build_session

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    spark = build_session(app_name="celebrity-pair-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100).count()

    hot = spark.range(k).select(
        F.lit(1).alias("s"), F.lit(1).alias("p"),
        F.col("id").alias("okey"), F.lit(0).cast("long").alias("ln"),
        F.to_date(F.lit("2024-01-01")).alias("d0"),
        F.date_add(
            F.to_date(F.lit("2024-01-01")), (F.col("id") % 28).cast("int") + 28
        ).alias("d1"),
    )
    bg = spark.range(100_000).select(
        (F.col("id") + 10).alias("s"), (F.col("id") + 10).alias("p"),
        F.col("id").alias("okey"), F.lit(0).cast("long").alias("ln"),
        F.to_date(F.lit("2024-01-01")).alias("d0"),
        F.date_add(F.to_date(F.lit("2024-01-01")), 30).alias("d1"),
    )
    li = hot.unionAll(bg).persist()
    li.count()
    cover = li.select(
        "s", "p", F.col("okey").alias("okey_a"), F.col("ln").alias("line_a"),
        F.col("d0").alias("a0"), F.col("d1").alias("a1"),
    )
    probe = li.select(
        "s", "p", F.col("okey").alias("okey_b"), F.col("ln").alias("line_b"),
        F.col("d0").alias("b0"), F.col("d1").alias("b1"),
    )

    def cand():
        return range_join(
            cover, probe, on=["s", "p"],
            cover_interval=("a0", "a1"), probe_interval=("b0", "b1"),
            bucket_days=28,
        )

    a_first = (F.col("okey_a") < F.col("okey_b")) | (
        (F.col("okey_a") == F.col("okey_b"))
        & (F.col("line_a") < F.col("line_b"))
    )

    def sel(c):
        return c.select(
            F.col("s").alias("suppkey"), F.col("p").alias("partkey"),
            *normalized_pair_cols(
                a_first,
                [("okey_a", "okey_b", "okey"), ("line_a", "line_b", "line")],
            ),
            interval_overlap_days("a0", "a1", "b0", "b1").alias("overlap_days"),
        )

    def legacy():
        c = cand().filter(
            ~(
                (F.col("okey_a") == F.col("okey_b"))
                & (F.col("line_a") == F.col("line_b"))
            )
        )
        return sel(c).distinct().count()

    def newform():
        keep = (F.col("a0") < F.col("b0")) | (
            (F.col("a0") == F.col("b0")) & a_first
        )
        return sel(cand().filter(keep)).count()

    n1, n2 = legacy(), newform()
    print(f"rows legacy={n1} filter={n2} equal={n1 == n2}")
    for name, fn in [("legacy", legacy), ("filter", newform)] * 2:
        t0 = time.time()
        fn()
        print(f"{name}: {time.time() - t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
