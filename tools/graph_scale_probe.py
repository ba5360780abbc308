"""Scale probe for the round-3 graph/mining family (VERDICT r3 #5).

Replicates the sf0.1 trade tables 10x with shifted entity keys (10
disjoint graph copies — nodes and edges both 10x) and the documents table
10x with near-duplicate perturbation, then times:

- ``pagerank_trade_network``   (4 unrolled message-passing rounds)
- ``trade_graph_butterflies``  (degree-capped wedge join)
- ``part_affinity_pairs``      (order-keyed wedge join + marginals)
- ``minhash_jaccard_calibration`` (estimate-vs-exact over LSH candidates)

plus the celebrity stress for the butterfly cap: a degree-MULTIPLIED edge
table (suppliers shifted per replica, customers shared, so every
customer's degree rises 10x past the 256 cap) with the cap on vs off.

Usage: python tools/graph_scale_probe.py [replicas]
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
KEY_SHIFT = 10**7  # keeps 2k+1 node encodings well inside int64


def build_replicated_dir(spark, replicas: int) -> str:
    """A synthetic sf dir with lineitem/orders/documents replicated
    ``replicas``x (entity keys shifted per replica -> disjoint copies;
    documents perturbed per replica -> near-duplicates), other tables
    copied as-is."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="graph_scale_")
    read = lambda t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")  # noqa: E731

    def write(df, t):
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    li = read("lineitem")
    write(
        _union(
            [
                li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * KEY_SHIFT))
                .withColumn("l_partkey", F.col("l_partkey") + F.lit(r * KEY_SHIFT))
                .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(r * KEY_SHIFT))
                for r in range(replicas)
            ]
        ),
        "lineitem",
    )
    o = read("orders")
    write(
        _union(
            [
                o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(r * KEY_SHIFT))
                .withColumn("o_custkey", F.col("o_custkey") + F.lit(r * KEY_SHIFT))
                for r in range(replicas)
            ]
        ),
        "orders",
    )
    d = read("documents")
    write(
        _union(
            [
                d.withColumn("doc_id", F.col("doc_id") + F.lit(r * 10**9))
                .withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(f" replica{r}" if r else "")),
                )
                for r in range(replicas)
            ]
        ),
        "documents",
    )
    for t in ("region", "nation", "customer", "supplier", "part", "events",
              "embeddings"):
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, f"{out}/{t}.parquet")
        elif os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")
    return out


def _union(dfs):
    big = dfs[0]
    for x in dfs[1:]:
        big = big.unionByName(x)
    return big


def timed(label, thunk):
    t0 = time.perf_counter()
    n = thunk()
    wall = time.perf_counter() - t0
    print(f"| {label} | {wall:.2f} s | {n} rows |", flush=True)
    return wall


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans import REGISTRY
    from stream_processing_pipeline_spark.plans.batch import butterfly_pairs

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
        "pagerank_trade_network",
        "trade_graph_butterflies",
        "part_affinity_pairs",
        "minhash_jaccard_calibration",
    )
    print(f"| query | wall | output |  ({replicas}x sf0.1, local[32])")
    for name in queries:
        for label, d in ((f"{name} 1x", SF_DIR), (f"{name} {replicas}x", big_dir)):
            timed(label, lambda d=d, name=name: REGISTRY[name].fn(spark, d).count())
            spark.catalog.clearCache()

    # Celebrity stress: shared customers, per-replica suppliers -> every
    # customer's distinct-supplier degree multiplies by `replicas` (past
    # the 256 cap at sf0.1 where base max degree is 102).
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    e1 = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    e_hot = _union(
        [e1.withColumn("s", F.col("s") + F.lit(r * KEY_SHIFT)) for r in range(replicas)]
    ).persist()
    e_hot.count()
    timed("butterflies hot-degree, cap 256", lambda: butterfly_pairs(e_hot, 256).count())
    timed(
        "butterflies hot-degree, cap off",
        lambda: butterfly_pairs(e_hot, 10**9).count(),
    )
    e_hot.unpersist()
    shutil.rmtree(big_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
