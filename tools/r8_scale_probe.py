"""Scale probe for the round-8 additions (VERDICT r5 #8 attribution rule:
new families get a measured 1x-vs-Nx ratio before the round closes).

Reuses the r7 replica builder shape. EVENTS grow by USERS (event_id 1e9 /
user_id 1e7 strides: per-user event density — the grain the timestamp
range join keys on — stays constant while keys multiply); DOCUMENTS grow
by doc_id stride with text unchanged per replica, deliberately: the
ingest's dedup must collapse the replicas, proving its state tracks
content novelty rather than bytes scanned. Probed:

- error_click_reaction_windows  (timestamp-axis bucketed range join)
- mm_jpeg_ac_decode_stats       (per-row generate+decode, AC path)
- stream_corpus_ingest          (availableNow foreachBatch pipeline)
- mm_gif_decode_stats           (per-row generate+LZW decode)

The round's other additions scale as their already-probed plan families:
window_funnel_strict/dedup_depths add one conditional min to the probed
funnel exchange, asof_next_purchase_after_error is the probed asof
union+window with the tag flipped, and the seq_match pair are numeric-
axis instances of the probed range-join shape (plus one min-agg hop).

Usage: python tools/r8_scale_probe.py [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = (
    "error_click_reaction_windows",
    "mm_jpeg_ac_decode_stats",
    "stream_corpus_ingest",
    "mm_gif_decode_stats",
)

_SHIFTS = {
    "documents": [("doc_id", 10**9)],
    "events": [("event_id", 10**9), ("user_id", 10**7)],
}


def build_replicated_dir(replicas: int) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = tempfile.mkdtemp(prefix="r8_scale_")
    for t, shifts in _SHIFTS.items():
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        parts = []
        for r in range(replicas):
            p = tbl
            for col, shift in shifts:
                idx = p.schema.get_field_index(col)
                shifted = pc.add(
                    p.column(col), pa.scalar(r * shift, p.schema.field(col).type)
                )
                p = p.set_column(idx, p.schema.field(col), shifted)
            parts.append(p)
        pq.write_table(pa.concat_tables(parts), f"{out}/{t}.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "embeddings"):
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")
    return out


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
    spark.sparkContext.setLogLevel("ERROR")
    big_dir = build_replicated_dir(replicas)
    print(f"| query | wall | output |  ({replicas}x sf0.1, local[32])", flush=True)
    ratios = {}
    for name in QUERIES:
        REGISTRY[name].fn(spark, SF_DIR).count()  # untimed warm pass
        spark.catalog.clearCache()
        walls = []
        for label, d in ((f"{name} 1x", SF_DIR), (f"{name} {replicas}x", big_dir)):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            cnt = REGISTRY[name].fn(spark, d).count()
            print(f"| {label} | {wall:.2f} s | {cnt} rows |", flush=True)
            walls.append(wall)
            spark.catalog.clearCache()
        ratios[name] = walls[1] / walls[0]
    print(flush=True)
    for name, r in ratios.items():
        print(f"| {name} | {r:.2f}x wall at {replicas}x rows |", flush=True)
    shutil.rmtree(big_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
