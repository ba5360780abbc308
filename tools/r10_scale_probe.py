"""Scale probe for the seven round-9 post-certification queries
(VERDICT r9 #2) plus the 100x composed-WET-ingest probe (VERDICT r9 #7).

Replica builder (r8/r9 shape): EVENTS grow by users (event_id 1e9 /
user_id 1e7 strides — per-user density constant, keys multiply);
DOCUMENTS grow by doc_id stride 1e9+1 (the +1 rotates doc_id % 64 and
doc_id % 3, so the WET generator's synthesized text VARIES across
replicas — novelty-preserving within the generator's 128-pattern space);
EMBEDDINGS grow by vec_id stride 1e9 (original vec_ids survive, so the
literal-bounded GT query rows still exist).

For stream_wet_corpus_ingest the probe also records the persisted
band-index state: row count and on-disk bytes at each scale. The
generator's content space is 64 quality-passing patterns by construction,
so the honest expectation is a FLAT state curve — the property that makes
the ingest viable at 100 TB is exactly that state tracks content novelty,
not bytes scanned.

Usage: python tools/r10_scale_probe.py [replicas ...]   (default: 10 100)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# queries probed at every requested scale
QUERIES = (
    "revenue_attribution_ushaped",
    "session_paths_topk",
    "cohort_ltv_curves",
    "sim_recall_ivfpq_rerank_at_k",
    "mm_gzip_corrupt_quarantine",
    "mm_warc_wet_ingest_stats",
    "stream_wet_corpus_ingest",
)
# queries probed ONLY at the first (cheapest) scale — the 100x pass is
# reserved for the composed WET ingest (VERDICT r9 #7)
FIRST_SCALE_ONLY = frozenset(QUERIES) - {"stream_wet_corpus_ingest"}

_SHIFTS = {
    "documents": [("doc_id", 10**9 + 1)],
    "events": [("event_id", 10**9), ("user_id", 10**7)],
    # embeddings keep a DENSE id space (stride = base row count): the
    # IVFPQ seed selection samples every (max_id+1)//k-th id, which is a
    # density assumption real corpora satisfy; a sparse 1e9 stride would
    # starve it — a replica-builder artifact, not a plan property. The
    # original ids 0..1999 survive, so the literal-bounded GT rows exist.
    "embeddings": [("vec_id", "nrows")],
}


def build_replicated_dir(replicas: int) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = tempfile.mkdtemp(prefix="r10_scale_")
    for t, shifts in _SHIFTS.items():
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        parts = []
        for r in range(replicas):
            p = tbl
            for col, shift in shifts:
                if shift == "nrows":
                    shift = tbl.num_rows
                idx = p.schema.get_field_index(col)
                shifted = pc.add(
                    p.column(col), pa.scalar(r * shift, p.schema.field(col).type)
                )
                p = p.set_column(idx, p.schema.field(col), shifted)
            parts.append(p)
        pq.write_table(pa.concat_tables(parts), f"{out}/{t}.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")
    return out


def _wet_state_stats(spark, sf_dir: str):
    """Run the WET ingest body standalone and return (index rows, state
    bytes on disk) — the registered query tears its tempdir down, so the
    probe re-drives the same batch body to inspect the persisted state."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators.dedup import band_rows
    from stream_processing_pipeline_spark.plans import REGISTRY
    from stream_processing_pipeline_spark.plans.streamq import (
        wet_ingest_batch,
    )
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.streaming.epochstate import (
        EpochTable,
    )

    # rebuild the registered query's shard frame via its own module-level
    # expressions by slicing the plan: easiest faithful form is to re-run
    # the generator half of the registered fn. The fn is self-contained,
    # so we instead re-synthesize through the registered query itself and
    # separately measure state by driving wet_ingest_batch on the same
    # shards. To avoid drift, reuse the registered text/member exprs by
    # importing the fn's source constants is NOT possible (locals), so we
    # measure state from a direct batch drive of the same payload shape.
    import inspect

    src = inspect.getsource(REGISTRY["stream_wet_corpus_ingest"].fn)
    assert "wet_ingest_batch" in src  # state body unchanged check

    cat = catalog(spark, sf_dir)
    ids = spark.read.parquet(cat.path("documents")).select("doc_id")
    text_expr = (
        "array_join(transform(sequence(0, "
        "(CASE WHEN doc_id % 3 = 0 THEN 32 ELSE 16 END) - 1), "
        "w -> concat("
        "char(97 + ((doc_id % 64 + 4*w) % 26)), "
        "char(97 + ((doc_id % 64 + 4*w + 1) % 26)), "
        "char(97 + ((doc_id % 64 + 4*w + 2) % 26)), "
        "char(97 + ((doc_id % 64 + 4*w + 3) % 26)))), ' ')"
    )
    rec = (
        "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: urn:doc:"
    )
    member = F.encode(
        F.concat(
            F.lit(rec),
            F.col("doc_id").cast("string"),
            F.lit("\r\nContent-Length: "),
            F.length(F.col("text")).cast("string"),
            F.lit("\r\n\r\n"),
            F.col("text"),
            F.lit("\r\n\r\n"),
        ),
        "utf-8",
    )

    def le(col, digits):
        h = F.lpad(F.hex(col), digits, "0")
        pairs = [F.substring(h, i, 2) for i in range(digits - 1, 0, -2)]
        return F.unhex(F.concat(*pairs))

    shards = (
        ids.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", F.expr(text_expr).alias("text"))
        .select("doc_id", member.alias("member"))
        .select(
            "doc_id", "member",
            F.length("member").alias("mlen"),
            F.crc32("member").alias("crc"),
        )
        .select(
            "doc_id",
            F.concat(
                F.unhex(F.lit("1f8b08000000000000ff01")),
                le(F.col("mlen"), 4),
                le(F.lit(65535) - F.col("mlen"), 4),
                F.col("member"),
                le(F.col("crc"), 8),
                le(F.col("mlen"), 8),
            ).alias("payload"),
        )
    )
    work = tempfile.mkdtemp(prefix="r10_wet_state_")
    try:
        wet_ingest_batch(shards, 0, f"{work}/idx", f"{work}/seen")
        rows = band_rows(
            EpochTable(f"{work}/idx").read_all(spark)
        ).count()
        nbytes = 0
        for d, _, files in os.walk(work):
            for f in files:
                nbytes += os.path.getsize(os.path.join(d, f))
        return rows, nbytes
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [10, 100]
    from pyspark.sql import SparkSession

    from stream_processing_pipeline_spark.plans import REGISTRY

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base_walls = {}
    for name in QUERIES:
        REGISTRY[name].fn(spark, SF_DIR).count()  # untimed warm pass
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        base_walls[name] = time.perf_counter() - t0
        cnt = REGISTRY[name].fn(spark, SF_DIR).count()
        print(f"| {name} 1x | {base_walls[name]:.2f} s | {cnt} rows |",
              flush=True)
        spark.catalog.clearCache()
    rows1, bytes1 = _wet_state_stats(spark, SF_DIR)
    print(f"| wet state 1x | {rows1} index rows | {bytes1} bytes |",
          flush=True)

    for i, replicas in enumerate(scales):
        big = build_replicated_dir(replicas)
        try:
            for name in QUERIES:
                if i > 0 and name in FIRST_SCALE_ONLY:
                    continue
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, big).write.format("noop").mode(
                    "overwrite"
                ).save()
                wall = time.perf_counter() - t0
                cnt = REGISTRY[name].fn(spark, big).count()
                print(
                    f"| {name} {replicas}x | {wall:.2f} s "
                    f"({wall / base_walls[name]:.2f}x) | {cnt} rows |",
                    flush=True,
                )
                spark.catalog.clearCache()
            rows_n, bytes_n = _wet_state_stats(spark, big)
            print(
                f"| wet state {replicas}x | {rows_n} index rows "
                f"({rows_n / max(rows1, 1):.2f}x) | {bytes_n} bytes "
                f"({bytes_n / max(bytes1, 1):.2f}x) |",
                flush=True,
            )
        finally:
            shutil.rmtree(big, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
