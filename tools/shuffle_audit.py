"""Measure per-query shuffle volume — evidence for the "minimize shuffles"
design rule (writes SHUFFLE.md).

For each audited query: run it to completion, attribute the new stages via
the Spark status REST API, and record input records vs shuffle-write
bytes/records (the vectorized parquet reader's inputBytes counter is not
meaningful, so input is measured in rows). The figure of merit is bytes
shuffled per row scanned: a well-shaped plan shuffles derived compact keys
(hashes, ids, partial aggregates), not raw data — single-digit B/row keeps
the network negligible next to the scan at any scale.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/shuffle_audit.py
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = 4046

# Query -> what its shuffle SHOULD be, stated up front so the measurement is
# checkable against the claim.
AUDITED = {
    "tpch_q1_pricing_summary": "partial/final agg only: shuffle = 6 groups of partial sums",
    "tpch_q3_shipping_priority": "broadcast dims; shuffle = orderkey join + per-order partials",
    "revenue_by_nation": "star join, nation/region broadcast; custkey + orderkey shuffle joins (r4 de-hinted) + 5 groups",
    "tpch_q18_large_volume_customers": "one lineitem agg on orderkey; survivors join orders, then custkey shuffle join (r4 de-hinted)",
    "tpch_q21_suppliers_kept_waiting": "semi/anti joins on compact (orderkey, suppkey) pairs",
    "dedup_exact": "16 B/doc = one (h60, id) pair per ~600 B document; text never moves",
    "dedup_minhash_lsh": "4 bands x (band_hash, id) per ~600 B doc; signatures, never shingles",
    "contamination_bench_overlap": "postings = one 8 B hash per distinct 4-gram (~0.6x the text bytes; raw grams would be ~4x)",
    "sim_topk_int8": "scales reduce + broadcast query codes; corpus unshuffled until top-k ranking",
    "text_repetition_stats": "(doc_id, gram, count) partials, ~1x text bytes (gram strings are the group keys)",
    "q6_counts_by_segment": "broadcast dim join; shuffle = windowed partial counts",
    "dedup_span_chunks": "one (id, chunk_no, h60) tuple per 16-token chunk; chunk text never leaves its scan partition",
    "corpus_pack_sequences": "one (id, n_tokens, shard, ord) row per doc into the shard window; text pruned at scan",
    "scd2_user_value_bands": "one user_id shuffle of (user, ts, id, band) rows serving both window passes",
    "hourly_purchases_gapfill": "hourly partials only: events aggregate before anything joins the spine",
    "mixture_token_budget": "one (id, source, n_tokens, ord) row per doc into the source running-sum window; text pruned at scan",
    "heavy_hitters_tokens": "MG sketch: <=65 rows/partition (candidates+total) shuffle; recount shuffles (token, partial) pairs for candidate tokens only",
    "layout_zorder_stats": "per-(file_id) min/max/count partials only — 16 groups, the coded rows never shuffle raw",
    "weighted_priority_sample": "TakeOrderedAndProject: k=100 rows per partition to the merge; no exchange at all",
    "bucketed_join_revenue": "steady state (write prewarmed): bucketed scans feed the join with ZERO exchange; shuffle = the tiny per-priority agg partials only",
    "sim_topk_ivfpq": "coded corpus (cell + 8 nibble codes) joins broadcast LUT rows on the cell key; vectors never shuffle, only (query, candidate, adc) triples rank",
    "user_value_ewma": "one user_id shuffle of (ts, event_id, cents) structs; the EWMA fold happens inside the grouped rows",
    "dedup_edit_distance": "zero shuffle at this SF: the blocked side broadcasts; at scale the self-join exchanges ~280 B/row (block key + 256-char prefix), full text never moves",
    "value_mad_outliers": "two event_type sort-window exchanges of (type, cents) pairs — the exact-median cost the histogram path avoids",
    "scd2_point_in_time_join": "spans (change-compressed) + purchase facts shuffle on user_id; fan-out bounded by spans per user",
    "user_value_trend": "commutative integer partials only: one user_id exchange for the window min, one for the five sums",
    "trailing_week_active_users": "distinct (user, day) then x7 day-replication — shuffle scales with user-days, not events",
    "partition_pruned_daily_stats": "steady state (write prewarmed): 3-day PartitionFilters scan + per-(date, type) agg partials only",
    "cms_token_freq": "sketch build: <= depth*width partial cells per task after map-side combine; the candidate recount shuffles (token, partial) pairs, the probe join broadcasts",
    "text_bigram_coverage": "postings = one 8 B hash per (doc, distinct bigram); raw text never moves, per-doc roll-up shuffles (doc_id, covered) pairs",
    "cdc_apply_snapshot": "one map-side-combined max_by: shuffle = one (key, champion-payload) partial per task-key, never the log",
    "join_key_skew_audit": "per-key counts map-side combine; the percentile window shuffles only distinct count values (count-of-counts)",
    "quality_filter_funnel": "every rule flag + cumulative conjunction reduces map-side to ONE row; shuffle = a handful of partial-agg rows",
    "lc_distinct_users_daily": "register column shuffles <= K=1024 buckets/(day,task); the EXACT companion column (the audit baseline, dropped in production) is what shuffles user ids",
    "bloom_source_membership_audit": "bitmap build shuffles <= n_bits position rows; probes shuffle (source, h, hit) triples, text never moves",
    "mm_shard_manifest": "one per-writer running-sum window over (doc_id, byte_len) pairs — payload bytes never shuffle",
    "sim_margin_mined_pairs": "broadcast query side x corpus partition; shuffle = top-2 (query, cos) rows into the window",
    "source_token_divergence": "(source, term, count) partials after map-side combine; term-grain join of compact counts — raw text never moves",
    "orders_reorder_interval": "per-customer lag window on (custkey, date, orderkey) rows; quantile walk shuffles only the <=2,400-row gap histogram",
    "trade_graph_butterflies": "deg-count, cap semi-join and wedge join all hash on the customer key — one edge-table exchange serves all three (r4)",
    "emb_matryoshka_fidelity": "zero shuffle: per-row energy ratios computed in the scan stage",
    "zorder_layout_audit": "ONE fact exchange to (z-file, linear-file) pair grain (<=1024 partial rows after map-side combine); both layout rollups re-aggregate the bounded pair table",
    "bpe_encode_fertility": "corpus collapses once to (source, pretoken-seq, count) partials; all 12 merge/encode steps run at vocab grain, raw text never re-shuffles",
    "dedup_cdc_chunk_pairs": "chunk assembly is in-scan array algebra; shuffle carries (chunk_hash, doc_id) 16 B rows into the df-capped inverted-index join — chunk text never moves",
    "part_affinity_triangles": "basket-capped (order, part) pairs, then 16-24 B oriented-edge rows (u, v, dv) through the wedge/closing joins — per-order pair fan-out bounded at C(32,2), wedge volume O(m^1.5) by orientation (r6)",
    "user_rfm_segments": "one purchase agg to user grain, then ONLY bounded-bin histogram partials shuffle (days/counts/dollar bins) — no user-grain sort anywhere (r6, the missing r5 row)",
    "dedup_minhash_lsh_capped": "identical 16 B (band_hash, id) rows as the uncapped join plus one posting-list window on the same key — the cap bounds per-bucket join OUTPUT at C(64,2) (r6)",
    "lsh_cap_recall_audit": "three pair tables (blocked/banded, never all-pairs) reduce to five 1-row counts; the shuffle is the pair tables' compact keys, the assembly is broadcast (r6)",
    "mm_ppm_decode_stats": "ZERO shuffle: payloads are generated, decoded, and reduced to per-doc stats inside one scan stage — the binary bytes never leave their task (r6)",
    "text_unigram_surprisal": "(doc, term) count partials after map-side combine; the LM join moves compact (term, count) rows, never token instances; doc rollup re-shuffles the tf grain (r6)",
    "supplier_part_transit_overlaps": "asymmetric band join: cover side ~span/28 bucket rows, probe side 1 row each — (s, p, bucket) keys + two dates, raw rows never replicate both-sided (r6)",
    "customer_inflight_order_overlaps": "order-grain intervals (one lineitem max-reduce) explode to ~span/28 bucket rows on (custkey, bucket); the probe side is 1 row per order and the report re-aggregates compact pair keys (r7)",
    "retrieval_rrf_fusion": "corpus scans never shuffle (both channels broadcast the query side); the only exchanges are two (n_queries x k) rank frames into the full-outer fusion (r7)",
    "mm_png_decode_stats": "ZERO shuffle after the id-only parallelism repartition: generate, inflate, unfilter, and reduce within one scan stage (r7)",
    "mm_jpeg_decode_stats": "ZERO shuffle after the id-only parallelism repartition: header + LUT-selected entropy bytes assemble and decode within one scan stage (r7)",
    "mm_jpeg_ac_decode_stats": "ZERO shuffle after the id-only parallelism repartition: same header constants + 224-entry AC-path LUT, decode + stats within one scan stage (r8)",
    "error_click_reaction_windows": "timestamp-axis range_join: error windows explode to <=2 epoch-600s buckets, clicks contribute 1 row each; merge-pinned equi-join on (user, bucket), per-user agg on colocated keys (r8)",
    "stream_corpus_ingest": "per micro-batch: one text_hash exchange for keepers, an anti-join against the seen table, band rows appended; the corpus text shuffles once per batch at keeper grain, the index summary re-aggregates 16 B band keys (r8)",
    "window_funnel_strict_depths": "same single user_id exchange as the default funnel; strict mode adds ONE conditional min per stage, no new shuffle (r8)",
    "asof_next_purchase_after_error": "one user_id exchange of union-tagged (error, purchase) rows into one analytic window — no inequality join, no second shuffle (r8)",
    "seq_match_view_click_purchase": "per stage: candidate instants + <=2-bucket predecessor intervals exchange on (user, bucket); DISTINCT back to candidate grain; never per-user arrays (r8)",
    "window_funnel_dedup_depths": "same single user_id exchange as the default funnel; one extra conditional min per stage (r8)",
    "seq_match_signup_then_quick_buy": "unbounded stage = one min-agg + equi-join (no explode); bounded stage = the <=2-bucket numeric band exchange (r8)",
    "mm_gif_decode_stats": "ZERO shuffle after the id-only parallelism repartition: header + per-doc literal LZW bytes assemble and decode within one scan stage (r8)",
    "mm_gif_corrupt_quarantine": "same zero-shuffle scan stage as the decode query plus one overlay branch; quarantine rows never leave their task (r8)",
    "lm_bigram_perplexity_filter": "(doc_id, bigram, tf) partials into the persisted tf table; LM train + score are bigram-key shuffle joins (sf-proportional LM never broadcast); vocab + reference mean ride 1-row frames (r9)",
    "corpus_remove_dup_spans": "keep/cut decision = (id, chunk_no, h60) 24 B tuples through one hash window; kept chunk text then moves exactly once, co-keyed to its doc's reassembly group (r9)",
    "sim_topk_ivfpq_rerank": "stage 1 = the probed IVFPQ broadcast-LUT join; stage 2 moves only R*Q shortlist rows + their fetched vectors through the rerank join (r9)",
    "mm_zip_decode_stats": "ZERO shuffle after the id-only parallelism repartition: archive assembly (JVM crc32 handshake) and parse_zip decode stay in one scan stage (r9)",
    "stream_corpus_ingest_two_phase": "two availableNow runs of the ingest body: keeper-grain text exchange + seen anti-join per batch, plus the band-rows probe join (16 B keys) against the prior epoch's index (r9)",
    "mm_gzip_decode_stats": "ZERO shuffle after the id-only parallelism repartition: multi-member assembly (stored-block + constant Huffman member) and parse_gzip decode stay in one scan stage (r9)",
    "stream_rate_limited_users": "stateful stream: one (user_id, ts_us, event_id) exchange into the GroupState op; state is (win, count, totals) per live key, emissions 1 row/key/batch (r6)",
    "mm_wav_pcm_stats": "payload bytes never shuffle: generation+decode+stats inside one scan stage; the only exchange is the 8-byte id repartition that sets decode parallelism (r6)",
    "kcore_part_affinity": "per-round shuffles carry (node, degree) pairs and shrinking 16 B edges — round cost tracks the SURVIVING edge set, monotonically down (r6)",
    "hilbert_layout_audit": "corpus collapses to <= 65,536 (dq, pq) cells; all curve math and rollups shuffle only cell-grain rows (r6)",
    "bitmap_user_type_index": "8-byte words at (type, word_idx) grain — |user domain|/32 rows per type through every set-op join (r6)",
    "range_partition_plan": "cents-grain histogram partials, a 1-row boundary broadcast back, and a 16-group final agg — no sort, no sample pass (r6)",
    "ivm_retractable_rollup": "one user_id exchange for the state window, then band-grain delta partials after map-side combine (r6)",
    "table_stats_profile": "six pruned single-column scans; shuffle is each column's distinct-key partials, output 6 rows — the Expand form was 19x slower (r6)",
    "window_funnel_depth": "one user_id exchange reused by all three stage joins (co-partitioned); depth histogram is a 4-group agg (r6)",
    "order_gap_survival": "one customer exchange for the gap window, week-grain partials after, the KM fold runs on one collected array row (r6)",
    "markov_removal_attribution": "one user exchange for the journey window; everything after runs on the 7x7 matrix row (r6)",
    "ks_doclen_source_drift": "value-grain (v, ca, cb) partials after map-side combine; the CDF window sees the bounded length domain only (r6)",
    "dedup_exact_substring_pairs": "16 B (hash, doc) postings, distinct per doc, df-capped — text never joins; pair volume tracks true shared spans (r6)",
    "mm_tar_member_index": "one repartition of (doc_id, text, lang) sets walker parallelism; archives never shuffle after synthesis (r6)",
}


def _get(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}{path}") as r:
        return json.load(r)


def main() -> None:
    from pyspark.sql import SparkSession

    from stream_processing_pipeline_spark.plans import REGISTRY

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("shuffle-audit")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = _get("/api/v1/applications")[0]["id"]

    def stage_rows():
        return {
            (s["stageId"], s["attemptId"]): s
            for s in _get(f"/api/v1/applications/{app_id}/stages")
            if s["status"] in ("COMPLETE", "ACTIVE")
        }

    # Layout queries pay a one-time write (bucketed tables / partitioned
    # store) on their FIRST in-session run; prewarm so the audited row
    # shows the steady-state read path the layout exists for.
    PREWARM = {"bucketed_join_revenue", "partition_pruned_daily_stats"}
    for name in PREWARM & set(AUDITED):
        REGISTRY[name].fn(spark, SF_DIR).collect()

    results = []
    seen = set(stage_rows())
    for name, claim in AUDITED.items():
        REGISTRY[name].fn(spark, SF_DIR).collect()
        rows = stage_rows()
        new = [s for key, s in rows.items() if key not in seen]
        seen = set(rows)
        in_rec = sum(s.get("inputRecords", 0) for s in new)
        shw = sum(s.get("shuffleWriteBytes", 0) for s in new)
        shw_rec = sum(s.get("shuffleWriteRecords", 0) for s in new)
        results.append((name, in_rec, shw, shw_rec, claim))
        print(f"{name:36s} inputRows={in_rec:9d} shuffleWrite={shw/1e6:8.3f}MB rows={shw_rec}")

    lines = [
        "# SHUFFLE — measured shuffle volume per headline query (auto-generated)",
        "",
        f"`tools/shuffle_audit.py` at `{SF_DIR}`, local[8], 32 shuffle",
        "partitions, AQE on. The figure of merit is **bytes shuffled per row",
        "scanned**: a well-shaped plan moves derived compact keys (hashes,",
        "ids, partial aggregates), not raw rows, so single-digit bytes/row",
        "means the network cost stays negligible next to the scan as data",
        "grows 1000x. (Parquet input is measured in records — the vectorized",
        "reader's byte counter is not meaningful.) Run-to-run caveat: under",
        "memory pressure AQE can flip a borderline broadcast to a shuffle",
        "join for one run — observed once on tpch_q21 (1.0 MB -> 10.9 MB,",
        "next run restored); re-measure before reading such a jump as a",
        "plan regression.",
        "",
        "| query | input rows | shuffle write | shuffle rows | shuffle B/input row | expected shuffle contents |",
        "|---|---|---|---|---|---|",
    ]
    for name, in_rec, shw, shw_rec, claim in results:
        per = f"{shw / in_rec:.2f}" if in_rec else "n/a"
        lines.append(
            f"| `{name}` | {in_rec:,} | {shw / 1e6:.3f} MB | {shw_rec:,} | {per} | {claim} |"
        )
    lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SHUFFLE.md"), "w") as f:
        f.write("\n".join(lines))
    print("SHUFFLE.md written")
    spark.stop()


if __name__ == "__main__":
    main()
