"""Scale probe for the round-6 additions (VERDICT r5 #8 attribution rule:
new families get a measured 1x-vs-Nx ratio before the round closes).

Replicates the sf0.1 fixtures 10x with pyarrow into SINGLE parquet files
(the streaming temporal join glob-filters on the literal file name
``events.parquet``, so replicas must stay one file per table):

- ``events``    — event ids shifted per replica, USER ids shifted too, so
                  the scale-up adds users rather than deepening per-user
                  history (the realistic growth axis for per-key windows)
- ``lineitem``  — order keys shifted per replica (disjoint baskets)
- ``documents`` / ``embeddings`` — ids shifted

Then times, warm, at 1x and Nx:

- ``ivm_retractable_rollup``     (per-key window + band-grain delta agg)
- ``stream_scd2_temporal_join``  (stream-static range join, complete agg)
- ``bitmap_user_type_index``     (word grain: |users|/32 per type)
- ``range_partition_plan``       (cents-grain histogram walk)
- ``table_stats_profile``        (union of six column-pruned scans)
- ``kcore_part_affinity``        (shrinking per-round edge sets)
- ``hilbert_layout_audit``       (bounded 65,536-cell grid -> ~flat)
- ``emb_jl_distance_fidelity``   (per-row projection + bounded pair audit)
- ``mm_wav_pcm_stats``           (per-row generate+decode map)

Usage: python tools/r6_scale_probe.py [replicas]
Prints one markdown-ish row per measurement (paste into SCALING.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = (
    "ivm_retractable_rollup",
    "stream_scd2_temporal_join",
    "bitmap_user_type_index",
    "range_partition_plan",
    "table_stats_profile",
    "kcore_part_affinity",
    "hilbert_layout_audit",
    "emb_jl_distance_fidelity",
    "mm_wav_pcm_stats",
    "window_funnel_depth",
    "daily_revenue_trailing_range",
    "order_gap_survival",
    "pareto_frontier_parts",
    "revenue_theil_sen",
    "user_event_trigrams",
)

_SHIFTS = {  # table -> (id column, per-replica shift)
    "events": [("event_id", 10**9), ("user_id", 10**7)],
    "lineitem": [("l_orderkey", 10**9)],
    "documents": [("doc_id", 10**9)],
    "embeddings": [("vec_id", 10**9)],
}


def build_replicated_dir(replicas: int) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = tempfile.mkdtemp(prefix="r6_scale_")
    for t, shifts in _SHIFTS.items():
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        parts = []
        for r in range(replicas):
            p = tbl
            for col, shift in shifts:
                idx = p.schema.get_field_index(col)
                shifted = pc.add(p.column(col), pa.scalar(r * shift, p.schema.field(col).type))
                p = p.set_column(idx, p.schema.field(col), shifted)
            parts.append(p)
        pq.write_table(pa.concat_tables(parts), f"{out}/{t}.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, f"{out}/{t}.parquet")
        elif os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")
    return out


def timed(label: str, thunk):
    t0 = time.perf_counter()
    n = thunk()
    wall = time.perf_counter() - t0
    print(f"| {label} | {wall:.2f} s | {n} rows |", flush=True)
    return wall


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import SparkSession

    from stream_processing_pipeline_spark.plans import REGISTRY

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    big_dir = build_replicated_dir(replicas)
    print(f"| query | wall | output |  ({replicas}x sf0.1, local[32])")
    ratios = {}
    for name in QUERIES:
        # untimed warm pass (same rationale as report_scale_probe: first
        # execution pays JVM/codegen warm-up that would skew the ratio)
        REGISTRY[name].fn(spark, SF_DIR).count()
        spark.catalog.clearCache()
        walls = []
        for label, d in ((f"{name} 1x", SF_DIR), (f"{name} {replicas}x", big_dir)):
            walls.append(
                timed(label, lambda d=d, name=name: REGISTRY[name].fn(spark, d).count())
            )
            spark.catalog.clearCache()
        ratios[name] = walls[1] / walls[0]
    print()
    for name, r in ratios.items():
        print(f"| {name} | {r:.2f}x wall at {replicas}x rows |")
    shutil.rmtree(big_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
