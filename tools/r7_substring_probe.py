"""Isolated scale probe for ``dedup_exact_substring_pairs`` (VERDICT r6 #6).

The r6 probe's 6.15x wall at 10x rode 1014x more OUTPUT pairs (verbatim
replicas: every doc matched its nine twins), so the plan's own scaling was
unmeasured. Two targeted variants fix that:

1. **shifted-text replicas** — each replica r suffixes EVERY token with
   ``~r``, so 10x input is 10x DISTINCT content: no cross-replica window
   hash can collide, true-pair density stays at the 1x level per replica,
   and the wall ratio isolates plan scaling (tokenize + all-offset hash +
   df-cap window + inverted-index self-join).
2. **df>cap boilerplate plant** — a fixed licence-header sentence appended
   to ``PLANT`` documents (PLANT > the df-64 cap) at 1x, run CAPPED vs
   UNCAPPED (cap lifted to 1e9 for the comparison run only). The capped
   run drops every pure-boilerplate window (df = PLANT > 64) so the
   C(PLANT, 2) boilerplate clique never reaches the self-join; junction
   windows (doc tail + boiler head) keep their genuine sub-cap collisions
   in BOTH runs, so the uncapped-minus-capped delta isolates exactly what
   the cap defends against.

Usage: python tools/r7_substring_probe.py [replicas] [plant]
Prints markdown rows for SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERY = "dedup_exact_substring_pairs"
BOILER = (
    "this document is provided under the synthetic corpus licence "
    "version two and may be redistributed only with this header intact "
    "verbatim"
)


def build_variants(replicas: int, plant: int) -> tuple[str, str, str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tempfile.mkdtemp(prefix="r7_substr_")
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet")
    df = tbl.to_pandas()

    # shifted-text replicas: suffix every token so content is distinct
    parts = [df]
    for r in range(1, replicas):
        rep = df.copy()
        rep["doc_id"] = rep["doc_id"] + r * 10**9
        rep["text"] = rep["text"].map(
            lambda t, r=r: " ".join(f"{w}~{r}" for w in str(t).split())
        )
        parts.append(rep)
    import pandas as pd

    shifted_dir = os.path.join(out, "shifted")
    os.makedirs(shifted_dir)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True), preserve_index=False),
        f"{shifted_dir}/documents.parquet",
    )

    # boilerplate plant at 1x: append the same sentence to `plant` docs
    planted = df.copy()
    mask = planted.index < plant
    planted.loc[mask, "text"] = planted.loc[mask, "text"].astype(str) + " " + BOILER
    plant_dir = os.path.join(out, "planted")
    os.makedirs(plant_dir)
    pq.write_table(
        pa.Table.from_pandas(planted, preserve_index=False),
        f"{plant_dir}/documents.parquet",
    )
    return out, shifted_dir, plant_dir


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    plant = int(sys.argv[2]) if len(sys.argv) > 2 else 200
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
    spark.sparkContext.setLogLevel("ERROR")
    root, shifted_dir, plant_dir = build_variants(replicas, plant)
    q = REGISTRY[QUERY].fn

    def run(d):
        t0 = time.perf_counter()
        n = q(spark, d).count()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        return wall, n

    run(SF_DIR)  # warm
    w1, n1 = run(SF_DIR)
    wN, nN = run(shifted_dir)
    wP, nP = run(plant_dir)
    from stream_processing_pipeline_spark.plans import dedupq

    saved = dedupq._ES_DF_CAP
    dedupq._ES_DF_CAP = 10**9
    try:
        wU, nU = run(plant_dir)
    finally:
        dedupq._ES_DF_CAP = saved
    print(f"| {QUERY} 1x | {w1:.2f} s | {n1} pairs |", flush=True)
    print(
        f"| {QUERY} {replicas}x shifted-text (distinct content) | {wN:.2f} s |"
        f" {nN} pairs | {wN / w1:.2f}x wall at {replicas}x rows,"
        f" {nN / max(n1, 1):.1f}x pairs |",
        flush=True,
    )
    print(
        f"| {QUERY} 1x + df-{plant} boilerplate plant, CAPPED | {wP:.2f} s |"
        f" {nP} pairs |",
        flush=True,
    )
    print(
        f"| {QUERY} 1x + df-{plant} boilerplate plant, UNCAPPED | {wU:.2f} s |"
        f" {nU} pairs | cap removes {nU - nP} boilerplate-driven pairs"
        f" (clique alone = {plant * (plant - 1) // 2}) at"
        f" {wU / wP:.2f}x the capped wall |",
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
