"""Scale probe for the ANN/similarity family (VERDICT r5 #5).

Replicates the sf0.1 ``embeddings`` table N x (vec ids shifted by the base
row count per replica, preserving the catalog's DENSE-id contract that the
PQ/IVF seed rules state; vectors identical) while the declared query
workload — the ``vec_id < literal`` prefix — stays FIXED, so the probe
isolates how each search structure's cost scales with CORPUS size at
constant query count:

- ``sim_ivf_static_assignments``  (IVF assignment: one centroid argmin per
                                   corpus vector — expect ~linear)
- ``sim_topk_pq``                 (PQ ADC scan: per-cell LUT dot over m=8
                                   4-bit codes)
- ``sim_topk_int8``               (SQ8 scan: integer dot over broadcast
                                   query codes — brute force over a 4x
                                   smaller column)
- ``sim_topk_lsh``                (single-probe LSH: bucket-equality join,
                                   cost tracks bucket occupancy)
- ``sim_topk_lsh_multiprobe``     (multiprobe LSH: xor-neighbor bucket
                                   expansion, 1+planes probes per query)
- ``sim_topk_bruteforce``         (float cosine reference scan)

Usage: python tools/ann_scale_probe.py [replicas]
Prints one markdown-ish table row per measurement (paste into SCALING.md).
Each family gets an UNTIMED warm pass first (JVM/codegen warm-up would
otherwise inflate the 1x figure and push ratios below 1 — the r5 probe
discipline).
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
    "sim_ivf_static_assignments",
    "sim_topk_pq",
    "sim_topk_int8",
    "sim_topk_lsh",
    "sim_topk_lsh_multiprobe",
    "sim_topk_bruteforce",
)


def build_replicated_dir(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="ann_scale_")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = e.agg(F.max("vec_id")).first()[0] + 1  # dense-id shift
    big = e
    for r in range(1, replicas):
        big = big.unionByName(
            e.withColumn("vec_id", F.col("vec_id") + F.lit(r * n))
        )
    big.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"):
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, f"{out}/{t}.parquet")
        elif os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")
    return out


def timed(label: str, thunk) -> float:
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
    big_dir = build_replicated_dir(spark, replicas)
    print(f"| query | wall | output |  ({replicas}x sf0.1 embeddings, "
          "fixed query set, local[32])")
    ratios = {}
    for name in QUERIES:
        REGISTRY[name].fn(spark, SF_DIR).count()  # untimed warm pass
        spark.catalog.clearCache()
        walls = []
        for label, d in ((f"{name} 1x", SF_DIR),
                         (f"{name} {replicas}x", big_dir)):
            walls.append(
                timed(label, lambda d=d, n=name: REGISTRY[n].fn(spark, d).count())
            )
            spark.catalog.clearCache()
        ratios[name] = walls[1] / walls[0]
    for name, r in ratios.items():
        print(f"| {name} ratio | {r:.2f}x |", flush=True)
    shutil.rmtree(big_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
