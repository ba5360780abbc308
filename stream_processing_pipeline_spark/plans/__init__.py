"""Query plans: the engine's registered query set.

Every query is a named pair (Spark callable, DuckDB oracle SQL) registered in
:mod:`.registry`; the driver contract (``__spark_entry__.py``) exposes them
verbatim. Modules:

- :mod:`.parity`     — the six reference queries (SURVEY.md §2.10) mapped onto
  the synthetic ``events`` star schema
- :mod:`.batch`      — batch analytics widening the operator surface: TPC-H-
  style aggregation/join/top-k, analytic window functions, set ops
- :mod:`.analyticsx` — round-4 extensions: robust stats, time-series
  diagnostics, strict funnels, mixture weighting, calibration audits
- :mod:`.dedupq`     — deduplication suite over ``documents``
- :mod:`.textq`      — text-analysis suite over ``documents``
- :mod:`.similarq`   — embedding similarity search over ``embeddings``
- :mod:`.multimodalq`— multimodal binary-column plumbing queries
"""

from .registry import REGISTRY, Query, all_oracles, all_queries, register

from . import parity  # noqa: E402,F401  (imports populate the registry)
from . import batch  # noqa: E402,F401
from . import streamq  # noqa: E402,F401
from . import dedupq  # noqa: E402,F401
from . import textq  # noqa: E402,F401
from . import similarq  # noqa: E402,F401
from . import multimodalq  # noqa: E402,F401
from . import tpchx  # noqa: E402,F401
from . import histq  # noqa: E402,F401
from . import scalex  # noqa: E402,F401
from . import analyticsx  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register", "all_queries", "all_oracles"]

# --------------------------------------------------------------- gate order
# The external correctness gate evaluates queries in registration order and
# each round records exactly the first ~50 registrations, so the gate
# effectively checks a prefix. Registration order is therefore part of the
# verification contract: queries whose driver-side evidence is newest-needed
# come first. Round-6 ordering (VERDICT.md r5 "Next round" #2):
#   1. queries NEW in round 6 (the hot-band-CAPPED LSH join — VERDICT r5
#      #1 — and later additions at the marker);
#   2. queries whose plans CHANGE in round 6: llm_corpus_stage_report
#      (near-dup stage switched to the capped band join),
#      part_affinity_triangles (basket-size cap in edge generation,
#      VERDICT r5 #3), metric_bootstrap_ci (ADVICE r5: explicit NULLS
#      LAST in the replicate rank window);
#   3. the 9 rotation-fill entries declared last round that missed the
#      r5 50-slot cutoff (VERDICT r5 "What's wrong" #3);
#   4. the 9 queries whose newest external row is still r1 vintage;
#   5. the 38 r2-vintage queries in registration order.
# r6-continuation note: the session's new-query block has grown the head
# PAST 50 — everything after slot 50 (the tail of block #4 and all of
# block #5) rolls to the r7 head. New queries outrank old evidence by
# the declared contract: a never-gated query has NO external row, while
# every displaced query keeps its r1/r2 row plus the continuously-run
# local three-SF mirror. Count the prefix with
#   python -c "from stream_processing_pipeline_spark.plans import
#              REGISTRY; print(list(REGISTRY)[:50])"
# rather than trusting arithmetic in this comment.
# NOTE: hll_sketch_rollup / approx_distinct_users are deliberately OUT of
# the prefix — they are rows-only by design (no_oracle) and can never
# produce a green hash row; spending gate slots on them is waste.
_GATE_PRIORITY = [
    # -- NEW in round 6 (insert additions here, newest first)
    "mm_tar_member_index",
    "ts_sax_similar_users",
    "dedup_exact_substring_pairs",
    "ks_doclen_source_drift",
    "chisq_type_hour_independence",
    "stream_ivm_retract_deltas",
    "markov_removal_attribution",
    "dq_benford_first_digit",
    "daily_revenue_trailing_range",
    "window_funnel_depth",
    "order_gap_survival",
    "revenue_theil_sen",
    "user_event_trigrams",
    "pareto_frontier_parts",
    "hilbert_layout_audit",
    "ivm_retractable_rollup",
    "table_stats_profile",
    "bitmap_user_type_index",
    "range_partition_plan",
    "token_zipf_curve",
    "stream_scd2_temporal_join",
    "emb_jl_distance_fidelity",
    "kcore_part_affinity",
    "mm_wav_pcm_stats",
    "stream_rate_limited_users",
    "supplier_part_transit_overlaps",
    "text_unigram_surprisal",
    "sql_groupby_all_daily_mix",
    "sim_ivf_cell_balance",
    "lsh_cap_recall_audit",
    "mm_ppm_decode_stats",
    "dedup_minhash_lsh_capped",
    # -- plans changed in round 6
    "llm_corpus_stage_report",
    "part_affinity_triangles",
    "metric_bootstrap_ci",
    # -- the 9 fill entries that missed the r5 cutoff
    "value_rank_family",
    "sliding_window_counts",
    "session_windows",
    "asof_last_click_before_purchase",
    "stream_user_stats",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # -- newest external row r1 (oldest evidence on the board)
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_components",
    "text_token_stats",
    "text_lang_id",
    "text_quality",
    "text_fingerprints",
    "quality_by_source",
    # -- newest external row r2, registration order; the 50-slot prefix
    #    cut falls in this block and the tail rolls into the r7 head
    "user_value_trailing_hour",
    "user_value_minmax_scaled",
    "event_props_extract",
    "dedup_embedding_cosine_lsh",
    "dedup_incremental",
    "dedup_keep_best_quality",
    "text_bpe_token_stats",
    "top_tokens",
    "token_stats_by_lang",
    "corpus_train_test_split",
    "mixture_downsample",
    "corpus_clean_train_sample",
    "stratified_sample_exact",
    "text_repetition_stats",
    "contamination_bench_overlap",
    "sim_topk_bruteforce",
    "sim_lsh_buckets",
    "sim_topk_lsh",
    "sim_topk_lsh_multiprobe",
    "sim_label_centroid_norms",
    "sim_ivf_static_assignments",
    "sim_topk_ivf_static",
    "emb_int8_quantize",
    "sim_topk_int8",
    "retrieval_quality_topk",
    "sim_pq_codes",
    "sim_topk_pq",
    "mm_metadata",
    "mm_frame_offsets",
    "mm_decode",
    "mm_resize",
    "tpch_q10_returned_items",
    "tpch_q12_late_shipments",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_dormant_accounts",
]
# Queries not named above (r3/r4/r5-green) keep registration order after
# the list — every one has a prior driver row, and every one is still
# re-verified per-commit by the local mirror (tools/driver_sim.py /
# tests/test_oracle_correctness.py).


def _apply_gate_priority() -> None:
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    for name, q in REGISTRY.items():
        ordered.setdefault(name, q)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_gate_priority()
