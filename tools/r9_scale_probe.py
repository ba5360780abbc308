"""Scale probe for the round-9 additions (VERDICT r5 #8 attribution rule:
new families get a measured 1x-vs-Nx ratio before the round closes).

Reuses the r8 replica builder shape: DOCUMENTS grow by doc_id stride with
text unchanged per replica, deliberately — the ingest/dedup/LM families
must respond to content novelty, not bytes scanned (the two-phase ingest's
exact+near-dup probes collapse the replicas; the bigram LM's vocabulary
stays fixed while its count table scales). Probed:

- stream_corpus_ingest_two_phase  (cross-batch near-dup probe + EpochTable)
- lm_bigram_perplexity_filter     (bigram-grain LM train + score joins)
- corpus_remove_dup_spans         (decision on hashes, text moves once)
- mm_zip_decode_stats             (per-row generate + container decode)

The round's other additions scale as already-probed families:
sim_topk_ivfpq_rerank is the probed IVFPQ probe plus a shortlist-bounded
(R x Q rows) semi-join — its corpus-side cost IS sim_topk_ivfpq's;
mm_zip_corrupt_quarantine is mm_zip_decode_stats with a constant overlay;
mm_gif_dict_decode_stats is the probed GIF shape with a constant tail;
seq_count_error_purchase_bursts reuses the probed sequence_match exchange.

Usage: python tools/r9_scale_probe.py [replicas]
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
    "stream_corpus_ingest_two_phase",
    "lm_bigram_perplexity_filter",
    "corpus_remove_dup_spans",
    "mm_zip_decode_stats",
)

_SHIFTS = {
    "documents": [("doc_id", 10**9)],
}


def build_replicated_dir(replicas: int) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = tempfile.mkdtemp(prefix="r9_scale_")
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
              "lineitem", "events", "embeddings"):
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
