"""PageRank past-broadcast-threshold probe (r13, VERDICT r12 #9).

At fixture scale the node-grain ``pr``/``contrib`` side auto-broadcasts, so
``pagerank_trade_network``'s per-iteration edge join never shuffles the
persisted edge list — which is why the r12 "degree-rides-edges" attempt
measured slower and was reverted. The open question was the PAST-THRESHOLD
shape: once the node side outgrows the broadcast limit, every iteration
becomes a shuffle join, and pre-partitioning the persisted edge table by
the join key should pin the edge side in place (one shuffle at build time,
zero per iteration).

This probe replicates the sf0.1 trade graph ``replicas``x (disjoint key-
shifted copies) and DISABLES auto-broadcast (`-1`) to put the session in
the past-threshold regime at local scale, then times the identical
4-iteration integer PageRank loop over

  A. the edge list persisted as scanned (today's shape), and
  B. the edge list hash-repartitioned by the join key ``u`` before the
     persist (the candidate production shape).

Both variants print top-20 checksums so the comparison is output-identical
by construction. Usage::

    python tools/r13_pagerank_partition_probe.py [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY_SHIFT = 10**7


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.batch import (
        _PR_DAMP,
        _PR_ITERS,
        _PR_SCALE,
        _PR_TELEPORT,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    e0_1 = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (2 * F.col("l_suppkey")).alias("u"),
            (2 * F.col("o_custkey") + 1).alias("v"),
        )
        .distinct()
    )
    reps = [
        e0_1.select(
            (F.col("u") + F.lit(2 * r * KEY_SHIFT)).alias("u"),
            (F.col("v") + F.lit(2 * r * KEY_SHIFT)).alias("v"),
        )
        for r in range(replicas)
    ]
    e0 = reps[0]
    for x in reps[1:]:
        e0 = e0.unionByName(x)
    sym = e0.unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def loop(ed):
        deg = ed.groupBy("u").agg(F.count(F.lit(1)).alias("d")).persist()
        pr = deg.select(
            F.col("u").alias("node"), F.lit(_PR_SCALE).cast("long").alias("pr")
        )
        for _ in range(_PR_ITERS):
            contrib = pr.join(deg, pr["node"] == deg["u"]).select(
                F.col("node"), F.expr("pr div d").alias("c")
            )
            pr = (
                ed.join(contrib, ed["u"] == contrib["node"])
                .groupBy(ed["v"])
                .agg(F.sum("c").alias("inflow"))
                .select(
                    F.col("v").alias("node"),
                    (
                        F.lit(_PR_TELEPORT)
                        + F.expr(f"({_PR_DAMP} * inflow) div {_PR_SCALE}")
                    ).cast("long").alias("pr"),
                )
                .localCheckpoint()
            )
        top = pr.orderBy(F.col("pr").desc(), "node").limit(20).collect()
        deg.unpersist()
        return sum(r.pr for r in top), sum(r.node for r in top)

    for label, ed in (
        ("A persisted-as-scanned", sym.persist()),
        ("B pre-partitioned by u", sym.repartition(32, "u").persist()),
    ):
        n = ed.count()  # materialize the persist outside the timed loop
        t0 = time.perf_counter()
        chk = loop(ed)
        wall = time.perf_counter() - t0
        print(
            f"| pagerank {replicas}x bcast-off {label} | {wall:.2f} s |"
            f" {n} edges | top20 checksum {chk} |",
            flush=True,
        )
        ed.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
