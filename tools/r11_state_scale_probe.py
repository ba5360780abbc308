"""High-cardinality streaming-state probe (VERDICT r10 #4).

Every sustained-soak state table in the committed benches tops out around
920 rows — real eviction evidence, but silent on the question the RocksDB
knobs exist to answer: what happens when state is BIG. This probe runs a
windowed per-key aggregation with effectively-unique keys (``key =
event_id % 1e9`` on top of the hourly window) and a deliberately long
watermark, so state ACCUMULATES to ~one row per event ingested — the
growing-state regime where the default HDFS-backed in-memory provider
must hold everything on the JVM heap while RocksDB spills to local disk.
For each (event-volume, provider) cell it records:

- ingest wall + events/s over the chunked available-now replay;
- final state rows (``numRowsTotal``) and provider-reported state memory
  (``memoryUsedBytes`` — heap estimate for HDFS, block-cache+memtable for
  RocksDB; RocksDB's on-disk footprint rides ``customMetrics``);
- RECOVERY wall: one extra chunk appended to the source and a fresh query
  started on the SAME checkpoint — the restart must reload (HDFS: full
  snapshot deserialize; RocksDB+changelog: last snapshot + changelog
  replay) before the tail batch commits.

Usage:
  python tools/r11_state_scale_probe.py   # sweeps sf0.01 (~30k state rows)
                                          # and sf0.1 (~300k state rows)
  python tools/r11_state_scale_probe.py \
    --sf-dirs /root/testdata/sf0.1 --replicas 30 \
    --watermark "3650 days" --driver-mem 32g   # r12: the ~3M-row decade
                                          # (VERDICT r11 #4). The watermark
                                          # must exceed the replica ts span
                                          # (30 days x replicas) or old
                                          # windows evict instead of
                                          # accumulating; heap budgeted
                                          # explicitly via --driver-mem.

Results land in SCALING.md (round-11 state-scale table); the runner
docstring (streaming/runner.py Topology.state_store) cites them.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
REPLICAS = 3
WATERMARK = "365 days"
N_CHUNKS = 12
# key = event_id % CARDINALITY with globally-unique event ids and ~14
# events per hourly window: collisions within a window are negligible, so
# STATE ROWS ~= EVENTS INGESTED — the growing-state regime. The state-size
# knob is therefore the event volume (SF x replicas), not the modulus.
CARDINALITY = 1_000_000_000
PROVIDERS = (
    # "hdfs" EXPLICIT, never None: the provider conf is session-sticky, so
    # a None cell after a rocksdb cell would silently re-measure rocksdb
    # (caught in the first probe run: the hdfs row carried
    # rocksdbPinnedBlocksMemoryUsage).
    ("hdfs", "hdfs", None),
    ("rocksdb", "rocksdb", False),
    ("rocksdb_changelog", "rocksdb", True),
)


def build_session(driver_mem: str = "16g"):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", driver_mem)
        .getOrCreate()
    )


def replicated_events(spark, sf_dir: str, replicas: int = REPLICAS):
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.sources.registry import TableCatalog

    ev = TableCatalog(spark, sf_dir, register_views=False).events
    reps = [
        ev.select(
            (F.col("event_id") + F.lit(r * 10**12)).alias("event_id"),
            # NTZ -> TIMESTAMP via cast (UTC session = identity): the
            # watermark operator rejects TIMESTAMP_NTZ event time.
            F.expr(f"ts + INTERVAL {30 * r} DAYS").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        for r in range(replicas)
    ]
    big = reps[0]
    for x in reps[1:]:
        big = big.unionByName(x)
    return big.withColumn(
        "key", (F.col("event_id") % CARDINALITY).cast("long")
    ).orderBy("ts")


def agg_stream(stream, watermark: str = WATERMARK):
    """Hourly windowed count/sum per synthetic key — one stateful operator
    whose row count is ~|distinct (window, key)| under the long watermark."""
    from pyspark.sql import functions as F

    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )


def state_stats(query) -> dict:
    p = query.lastProgress
    if p is None:
        return {}
    ops = (json.loads(p.json) if hasattr(p, "json") else p).get("stateOperators", [])
    if not ops:
        return {}
    op = ops[0]
    return {
        "rows": op.get("numRowsTotal"),
        "mem_bytes": op.get("memoryUsedBytes"),
        "custom": {
            k: v
            for k, v in (op.get("customMetrics") or {}).items()
            if "SizeBytes" in k or "Memory" in k
        },
    }


def run_cell(
    spark, sf_dir: str, label: str, provider, changelog,
    replicas: int = REPLICAS, watermark: str = WATERMARK,
) -> dict:
    from stream_processing_pipeline_spark.sources.files import read_stream
    from stream_processing_pipeline_spark.sources.memory import chunked_stream
    from stream_processing_pipeline_spark.streaming import Topology
    from stream_processing_pipeline_spark.streaming.runner import StreamQuerySpec

    work = tempfile.mkdtemp(prefix=f"state_probe_{label}_")
    big = replicated_events(spark, sf_dir, replicas)
    n_events = big.count()
    stream = chunked_stream(spark, big, work + "/chunks", n_chunks=N_CHUNKS)

    def noop_sink(batch_df, epoch_id):
        batch_df.write.format("noop").mode("overwrite").save()

    topo = Topology(
        spark,
        checkpoint_root=work + "/ckpt",
        state_partitions=8,
        state_store=provider,
        changelog_checkpointing=changelog,
    )
    topo.add(StreamQuerySpec("state_scale", agg_stream(stream, watermark), noop_sink))
    t0 = time.perf_counter()
    queries = topo.start_all(available_now=True)
    topo.await_all(timeout=1200)
    ingest_wall = time.perf_counter() - t0
    stats = state_stats(queries["state_scale"])
    topo.stop_all()

    # ---- recovery: append ONE tail chunk, restart on the same checkpoint
    tail = big.limit(2000)
    tail.coalesce(1).write.mode("overwrite").parquet(work + f"/chunks/chunk={N_CHUNKS}")
    stream2 = read_stream(
        spark, work + "/chunks/chunk=*", schema=big.schema, max_files_per_trigger=1
    )
    topo2 = Topology(
        spark,
        checkpoint_root=work + "/ckpt",
        state_partitions=8,
        state_store=provider,
        changelog_checkpointing=changelog,
    )
    topo2.add(StreamQuerySpec("state_scale", agg_stream(stream2, watermark), noop_sink))
    t0 = time.perf_counter()
    queries2 = topo2.start_all(available_now=True)
    topo2.await_all(timeout=1200)
    recovery_wall = time.perf_counter() - t0
    stats2 = state_stats(queries2["state_scale"])
    topo2.stop_all()
    shutil.rmtree(work, ignore_errors=True)
    return {
        "sf_dir": sf_dir,
        "provider": label,
        "replicas": replicas,
        "watermark": watermark,
        "events": n_events,
        "ingest_sec": round(ingest_wall, 2),
        "events_per_sec": round(n_events / ingest_wall),
        "state": stats,
        "recovery_sec": round(recovery_wall, 2),
        "state_after_recovery": stats2,
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", default=",".join(SF_DIRS))
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument("--watermark", default=WATERMARK)
    ap.add_argument("--driver-mem", default="16g")
    args = ap.parse_args()

    spark = build_session(args.driver_mem)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg {open('/proc/loadavg').read().split()[0]}", file=sys.stderr)
    for sf_dir in args.sf_dirs.split(","):
        for label, provider, changelog in PROVIDERS:
            cell = run_cell(
                spark, sf_dir, label, provider, changelog,
                replicas=args.replicas, watermark=args.watermark,
            )
            print(json.dumps(cell), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
