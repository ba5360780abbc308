"""SparkSession factory.

Generalizes the reference's hard-coded session builder
(``/root/reference/src/spark_streaming.py:27-35``: appName ``KafkaToPostgres``,
``spark.sql.shuffle.partitions=9``, local warehouse dirs) into a config-driven
factory with scale-appropriate defaults.

Scale notes (the engine targets a 1000-executor cluster over ~100 TB even
though tests run on ``local[32]``):

- AQE is enabled: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast conversion replace hand-tuned partition
  counts at scale.
- ``spark.sql.shuffle.partitions`` defaults to a local-friendly number; on a
  real cluster leave AQE to coalesce from a high initial value (set
  ``shuffle_partitions`` to ~2-3x total cores).
- Timestamps: the session timezone is pinned to UTC so results are
  reproducible across machines and match naive-timestamp oracles (DuckDB).
- ``spark.sql.legacy.parquet.nanosAsLong=true`` lets Spark ingest parquet
  written with nanosecond timestamps (Spark's TimestampType is microseconds);
  the table catalog (:mod:`.sources.registry`) converts ns-longs to proper
  timestamps with the same truncation semantics DuckDB applies.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["build_session", "default_parallelism"]


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def build_session(
    app_name: str = "stream_processing_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Any ``extra_conf`` entries win over the defaults, so callers can override
    per-job (e.g. a streaming job pinning ``spark.sql.shuffle.partitions`` to
    its state-store partitioning).
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        # Size the single local JVM to the machine: Spark's 1g default
        # packs all `cores` executor threads into one tiny heap (32 MB/
        # thread at local[32]) — r8 measured a SortMergeJoin spill-reader
        # OOM at sf0.1 under it. Only effective at JVM launch; getOrCreate
        # on an existing session leaves the running heap untouched.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at Spark's default TRUE (r13 measured the
        # alternative): `parallelismFirst=false` + 64m advisory — the guide
        # §2.2 "partitions sized by bytes" move that fixes the sub-second
        # anti-scaling cluster (spec_*/sql_* gained 5-10%) — coalesces
        # SMALL-BYTES/HIGH-CPU post-shuffle stages to ~1 partition and
        # serializes them: full-bench A/B showed text_fingerprints 5.8x,
        # text_lang_id 3.9x, text_quality 3.5x SLOWER (normalized). This
        # corpus's shuffles are KB-sized with regex-heavy reducers, so
        # partition-by-bytes starves compute exactly where partition-by-
        # cores pays; see OPTIMIZATION_r13.md for the full table.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
