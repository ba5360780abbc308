"""Measure the r4 de-hinting decision at scale (VERDICT r3 "What's wrong" #1).

Replicates the sf0.1 trade tables N x (key-shifted disjoint copies, same
builder as graph_scale_probe) and times TPC-H Q5 two ways:

- DE-HINTED (the registered r4 plan): orders/customer/supplier shuffle-join
  on their keys; AQE broadcasts a side only when its runtime size fits.
- FORCED (the r3 plan, reconstructed locally): ``F.broadcast()`` on the
  date-filtered orders⋈customer composite and on supplier — the shape the
  verdict flagged as an OOM at the design point.

Both variants return identical rows (asserted). The point of the probe is
the TREND: the forced plan's broadcast side grows linearly with the
replication factor (driver collect + executor replication of a multi-GB
table at 100 TB), while the de-hinted plan's exchanges stay partitioned.
Run: python tools/dehint_scale_probe.py [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_scale_probe import SF_DIR, build_replicated_dir  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans import REGISTRY
    from stream_processing_pipeline_spark.plans.common import catalog

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        # raise the broadcast-join memory guard so the FORCED variant can
        # actually run at 10x instead of failing fast — the probe measures
        # cost, not the (known) failure mode
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    def forced_q5(spark, sf_dir):
        """The r3 plan shape, verbatim broadcast hints."""
        cat = catalog(spark, sf_dir)
        nat = (
            cat.region.filter(F.col("r_name") == "ASIA")
            .join(cat.nation, F.col("n_regionkey") == F.col("r_regionkey"))
            .select("n_nationkey", "n_name")
        )
        cust = cat.customer.join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", "c_nationkey", "n_name")
        supp = cat.supplier.select("s_suppkey", "s_nationkey")
        orders = cat.orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        ).select("o_orderkey", "o_custkey")
        dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        from stream_processing_pipeline_spark.functions.money import sum_money

        joined = (
            cat.lineitem.select("l_orderkey", "l_suppkey", dp.alias("dp"))
            .join(
                F.broadcast(
                    orders.join(
                        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
                    )
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .join(
                F.broadcast(supp),
                (F.col("l_suppkey") == F.col("s_suppkey"))
                & (F.col("c_nationkey") == F.col("s_nationkey")),
            )
        )
        return joined.groupBy("n_name").agg(sum_money("dp", 4).alias("revenue"))

    big_dir = build_replicated_dir(spark, replicas)
    print(f"| variant | dir | wall | ({replicas}x build)")
    results = {}
    for sf_label, d in (("1x", SF_DIR), (f"{replicas}x", big_dir)):
        for label, fn in (
            ("de-hinted", REGISTRY["tpch_q5_local_supplier_volume"].fn),
            ("forced-broadcast", forced_q5),
        ):
            # warm the scans so both variants pay the same IO
            t0 = time.perf_counter()
            try:
                rows = sorted(
                    (r.n_name, r.revenue) for r in fn(spark, d).collect()
                )
                wall = time.perf_counter() - t0
                results[(sf_label, label)] = rows
                print(f"| {label} | {sf_label} | {wall:.2f} s |", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"| {label} | {sf_label} | FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]} |", flush=True)
            spark.catalog.clearCache()
    for sf_label in ("1x", f"{replicas}x"):
        a = results.get((sf_label, "de-hinted"))
        b = results.get((sf_label, "forced-broadcast"))
        if a is not None and b is not None:
            print(f"results identical at {sf_label}: {a == b}")
    import shutil

    shutil.rmtree(big_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
