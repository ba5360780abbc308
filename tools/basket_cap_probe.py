"""Planted-bot-cart probe for the triangle edge-generation basket cap
(VERDICT r5 #3) — the market-basket analog of the r4 celebrity-node graph
probe.

Builds a lineitem table = the sf0.1 fixture PLUS two identical planted
orders of B distinct parts each (a "bot cart" scraped twice, so every
planted pair clears the support-2 edge threshold), then measures the
edge-generation stage (the per-order pair self-join + support filter)
UNCAPPED vs CAPPED at 32:

- pair rows emitted by the self-join BEFORE the support filter (the
  quadratic term the cap bounds: one B-item basket alone emits B*(B-1)/2)
- wall time of edge generation
- resulting edge count

Usage: python tools/basket_cap_probe.py [basket_size]   (default 2000)
Prints markdown rows for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    basket = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.batch import _TRI_BASKET_CAP

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    max_o = li.agg(F.max("o")).first()[0]
    parts = [1 + 5 * i for i in range(basket)]
    bot = spark.createDataFrame(
        [(int(max_o) + 1 + r, p) for r in range(2) for p in parts],
        "o long, p long",
    )
    planted_dir = tempfile.mkdtemp(prefix="basket_cap_")
    li.unionByName(bot).write.mode("overwrite").parquet(
        f"{planted_dir}/li.parquet"
    )
    base = spark.read.parquet(f"{planted_dir}/li.parquet")

    def edge_gen(capped: bool):
        op = base.distinct()
        if capped:
            w = Window.partitionBy("o").orderBy("p")
            op = (
                op.withColumn("rn_", F.row_number().over(w))
                .filter(F.col("rn_") <= _TRI_BASKET_CAP)
                .drop("rn_")
            )
        a = op.select("o", F.col("p").alias("x"))
        b = op.select(F.col("o").alias("o2"), F.col("p").alias("y"))
        pairs = a.join(
            b, (F.col("o") == F.col("o2")) & (F.col("x") < F.col("y"))
        )
        edges = (
            pairs.groupBy("x", "y")
            .agg(F.count(F.lit(1)).alias("s"))
            .filter(F.col("s") >= 2)
        )
        return pairs, edges

    # untimed warm pass
    edge_gen(True)[1].count()

    print(f"| variant | wall | pair rows | edges |  (sf0.1 lineitem + "
          f"2 planted {basket}-item carts, cap={_TRI_BASKET_CAP}, local[32])")
    for label, capped in (("uncapped", False), (f"capped {_TRI_BASKET_CAP}",
                                                True)):
        pairs, edges = edge_gen(capped)
        t0 = time.perf_counter()
        n_pairs = pairs.count()
        n_edges = edges.count()
        wall = time.perf_counter() - t0
        print(f"| {label} | {wall:.2f} s | {n_pairs:,} | {n_edges:,} |",
              flush=True)
    import shutil

    shutil.rmtree(planted_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
