"""Scale probe for the composition/report family (VERDICT r4 #6).

Replicates the sf0.1 ``documents`` table 10x (doc ids shifted per replica,
text perturbed per replica so the copies are near- rather than exact
duplicates) and ``embeddings`` 10x (vec ids shifted, vectors identical — a
pure row-count scale-up for the reduction-shaped queries), then times at
1x and Nx:

- ``source_curation_report``    (r4 capstone: 6 kernels over one persisted
                                 token base)
- ``llm_corpus_stage_report``   (r3 stage-funnel composition)
- ``emb_top_pc_power_iteration`` (6 integer-exact power-iteration rounds)
- ``bpe_encode_fertility``      (r5: trained-tokenizer encode; vocab-bound
                                 by design, so Nx corpus should move it
                                 far less than Nx)

Usage: python tools/report_scale_probe.py [replicas]
Prints one markdown-ish table row per measurement (paste into SCALING.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _union(dfs):
    big = dfs[0]
    for x in dfs[1:]:
        big = big.unionByName(x)
    return big


def build_replicated_dir(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="report_scale_")
    read = lambda t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")  # noqa: E731

    d = read("documents")
    _union(
        [
            d.withColumn("doc_id", F.col("doc_id") + F.lit(r * 10**9))
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(f" replica{r}" if r else "")),
            )
            for r in range(replicas)
        ]
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    e = read("embeddings")
    _union(
        [
            e.withColumn("vec_id", F.col("vec_id") + F.lit(r * 10**9))
            for r in range(replicas)
        ]
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, f"{out}/{t}.parquet")
        elif os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")
    return out


def timed(label, thunk):
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
    queries = (
        "source_curation_report",
        "llm_corpus_stage_report",
        "emb_top_pc_power_iteration",
        "bpe_encode_fertility",
    )
    print(f"| query | wall | output |  ({replicas}x sf0.1, local[32])")
    ratios = {}
    for name in queries:
        # untimed warm pass: the first execution of each family pays JVM/
        # codegen warm-up that would otherwise inflate the 1x figure and
        # deflate the ratio below 1 (observed 0.69x without it)
        REGISTRY[name].fn(spark, SF_DIR).count()
        spark.catalog.clearCache()
        walls = []
        for label, d in ((f"{name} 1x", SF_DIR), (f"{name} {replicas}x", big_dir)):
            walls.append(
                timed(label, lambda d=d, name=name: REGISTRY[name].fn(spark, d).count())
            )
            spark.catalog.clearCache()
        ratios[name] = walls[1] / walls[0]
    for name, r in ratios.items():
        print(f"| {name} ratio | {r:.2f}x |", flush=True)
    shutil.rmtree(big_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
