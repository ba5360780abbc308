"""Skew probe: measured evidence for the dedup-band hot-key story (SCALING.md).

Two experiments on local[32], both with deliberately planted heavy hitters:

1. **Hot LSH band** — replicate the sf0.1 documents 10x and plant a block of
   identical documents (every replica shares all 4 band hashes -> one band
   bucket holds the whole block and the self-join does n^2 work inside it).
   Measures the band self-join with AQE skew-join on vs off, and with the
   hot-band cap (bands whose posting list exceeds ``cap`` are diverted —
   identical docs are exact-dedup's job and contribute nothing to
   *near*-dup detection).
2. **Salted fact join** — events with a planted hot user joined to a
   per-user dimension: plain shuffle join (AQE on/off) vs
   ``operators.scale.salted_join``.

Prints one JSON line per measurement; paste-ready for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_pipeline_spark.operators.dedup import lsh_bands, minhash_table
from stream_processing_pipeline_spark.operators.scale import salted_join
from stream_processing_pipeline_spark.plans.common import catalog
from stream_processing_pipeline_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SKEW_REPLICAS", "10"))
HOT_DOCS = int(os.environ.get("SKEW_HOT_DOCS", "400"))


def timed(label: str, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(json.dumps({"probe": label, "sec": round(dt, 2), "rows": n}))
    return dt


def main() -> None:
    spark = build_session(app_name="skew_probe", shuffle_partitions=32)
    docs = catalog(spark, SF_DIR).documents.select("doc_id", "lang", "text")
    base_n = docs.count()

    # 10x corpus with REPLICAS distinct copies; then overwrite a HOT_DOCS
    # block with one identical text -> a single band bucket of size
    # HOT_DOCS*REPLICAS (the adversarial hot key).
    rep = docs.crossJoin(
        spark.range(REPLICAS).withColumnRenamed("id", "rep")
    ).select(
        (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
        "lang",
        F.when(
            F.col("doc_id") < HOT_DOCS, F.lit("the same boilerplate page " * 12)
        )
        .otherwise(F.concat("text", F.lit(" r"), F.col("rep")))
        .alias("text"),
    )
    rep.write.mode("overwrite").parquet("/tmp/skew_docs.parquet")
    corpus = spark.read.parquet("/tmp/skew_docs.parquet")
    n = corpus.count()
    hot = HOT_DOCS * REPLICAS
    print(
        json.dumps(
            {
                "probe": "fixture",
                "docs": n,
                "base": base_n,
                "hot_bucket_docs": hot,
                "hot_bucket_pairs": hot * (hot - 1) // 2,
            }
        )
    )

    bands = lsh_bands(minhash_table(corpus), n_bands=4, rows_per_band=4)
    bands.write.mode("overwrite").parquet("/tmp/skew_bands.parquet")
    b = spark.read.parquet("/tmp/skew_bands.parquet")

    def band_join(df):
        a, c = df.alias("a"), df.alias("b")
        return (
            a.join(
                c,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id"), F.col("b.doc_id"))
            .distinct()
            .count()
        )

    def with_conf(pairs, fn):
        for k, v in pairs:
            spark.conf.set(k, v)
        try:
            return fn()
        finally:
            for k, _ in pairs:
                spark.conf.unset(k)

    timed(
        "band_selfjoin_aqe_off",
        lambda: with_conf(
            [("spark.sql.adaptive.enabled", "false")], lambda: band_join(b)
        ),
    )
    timed(
        "band_selfjoin_aqe_skew_on",
        lambda: with_conf(
            [
                ("spark.sql.adaptive.enabled", "true"),
                ("spark.sql.adaptive.skewJoin.enabled", "true"),
                ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
                (
                    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                    "8MB",
                ),
            ],
            lambda: band_join(b),
        ),
    )

    # Hot-band cap: bands with a posting list over `cap` docs carry no
    # near-dup signal (identical docs are exact dedup's job) — divert them.
    cap = 64
    counts = b.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("df_")
    )
    capped = b.join(
        counts.filter(F.col("df_") <= cap), ["band_idx", "band_hash"]
    ).drop("df_")
    timed("band_selfjoin_hot_cap64", lambda: band_join(capped))

    # --- salted fact join -------------------------------------------------
    ev = catalog(spark, SF_DIR).events.select("event_id", "user_id", "value")
    hot_ev = ev.withColumn(
        "user_id", F.when(F.rand(7) < 0.5, F.lit(1)).otherwise(F.col("user_id"))
    )
    hot_ev.write.mode("overwrite").parquet("/tmp/skew_events.parquet")
    fact = spark.read.parquet("/tmp/skew_events.parquet")
    dim = fact.groupBy("user_id").agg(F.avg("value").alias("user_avg"))
    dim.write.mode("overwrite").parquet("/tmp/skew_dim.parquet")
    dim = spark.read.parquet("/tmp/skew_dim.parquet")

    def plain_join():
        return (
            fact.join(dim.hint("shuffle_hash"), "user_id")
            .filter(F.col("value") > F.col("user_avg"))
            .count()
        )

    def salted():
        return (
            salted_join(fact, dim, on="user_id", n_salts=32)
            .filter(F.col("value") > F.col("user_avg"))
            .count()
        )

    off = [
        ("spark.sql.adaptive.enabled", "false"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
    ]
    on = [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
    ]
    timed("fact_join_plain_aqe_off", lambda: with_conf(off, plain_join))
    timed("fact_join_plain_aqe_on", lambda: with_conf(on, plain_join))
    timed("fact_join_salted_aqe_off", lambda: with_conf(off, salted))

    # --- same join at NATURAL (1x) skew ------------------------------------
    # The decision-table baseline (SCALING.md r5): identical join, no
    # planted hot key — measures what each strategy costs when there is
    # nothing to fix (salting's explode+wider-key overhead shows here).
    ev.write.mode("overwrite").parquet("/tmp/skew_events_1x.parquet")
    fact1 = spark.read.parquet("/tmp/skew_events_1x.parquet")
    dim1 = fact1.groupBy("user_id").agg(F.avg("value").alias("user_avg"))
    dim1.write.mode("overwrite").parquet("/tmp/skew_dim_1x.parquet")
    dim1 = spark.read.parquet("/tmp/skew_dim_1x.parquet")

    def plain_join_1x():
        return (
            fact1.join(dim1.hint("shuffle_hash"), "user_id")
            .filter(F.col("value") > F.col("user_avg"))
            .count()
        )

    def salted_1x():
        return (
            salted_join(fact1, dim1, on="user_id", n_salts=32)
            .filter(F.col("value") > F.col("user_avg"))
            .count()
        )

    timed("fact_join_1x_plain_aqe_off", lambda: with_conf(off, plain_join_1x))
    timed("fact_join_1x_plain_aqe_on", lambda: with_conf(on, plain_join_1x))
    timed("fact_join_1x_salted_aqe_off", lambda: with_conf(off, salted_1x))
    spark.stop()


if __name__ == "__main__":
    main()
