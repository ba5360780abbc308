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
# each round records exactly the first 50 registrations, so the gate
# effectively checks a prefix. Registration order is therefore part of the
# verification contract: queries whose driver-side evidence is newest-needed
# come first. Round-11 ordering (VERDICT.md r10 "Next round" #1, executing
# the r10-declared head to the slot):
#   1. the 22 r5-vintage deferrals from the zero-slack r10 rotation
#      (tpch_q3_shipping_priority .. grouping_sets_revenue, r05 slot
#      order), verbatim in their declared order — the oldest external
#      evidence left in the registry. 22 slots.
#   2. the 10 queries NEW in round 10, in their declared
#      plans/__init__.py slots-51+ order (mirror-green at 3 SFs all of
#      r10, no external row yet by the zero-slack rotation). 10 slots.
#   3. 18 of the 44 oracle-bearing queries whose newest external row is
#      r6-vintage, oldest evidence first (CORRECTNESS_r06.json slot
#      order within the equal-vintage set): dedup_exact_substring_pairs
#      through stream_scd2_temporal_join. 22 + 10 + 18 = EXACTLY 50,
#      zero slack. The 26 r6-vintage queries that do not fit
#      (emb_jl_distance_fidelity .. text_lang_id, r06 slot order) are
#      deferred to slots 51+ and form the FIRST entries of the r12 gate
#      head; every one keeps its r6 driver row and stays mirror-verified
#      at 3 SFs per commit. After the r11 gate, every registered query's
#      newest external row is r6+ with r6 itself down to those 26
#      documented deferrals (plus any query first registered in r11).
# Count the prefix with
#   python -c "from stream_processing_pipeline_spark.plans import
#              REGISTRY; print(list(REGISTRY)[:50])"
# rather than trusting arithmetic in this comment.
# NOTE: hll_sketch_rollup / approx_distinct_users gained register-exact
# DuckDB oracles in round 11 (VERDICT r10 #2) and are queued for their
# first hash-verifiable external rows in the r12 head.
_GATE_PRIORITY = [
    # -- slots 1-22: the r5-vintage deferrals (r10 zero-slack overflow),
    #    declared r11-head-first in r10; oldest evidence in the registry
    "tpch_q3_shipping_priority",
    "revenue_by_nation",
    "top_events_per_user",
    "user_running_value",
    "engaged_users_set_ops",
    "daily_distinct_users",
    "rollup_revenue",
    "customers_without_orders",
    "parts_with_lineitems",
    "user_value_deltas",
    "tpch_q6_forecast_revenue",
    "value_percentiles_by_type",
    "daily_counts_pivoted",
    "user_event_type_signature",
    "sql_api_revenue_summary",
    "tpch_q4_order_priority",
    "tpch_q14_promo_revenue",
    "dq_lineitem_report",
    "dq_referential_integrity",
    "string_functions_showcase",
    "datetime_functions_showcase",
    "grouping_sets_revenue",
    # -- slots 23-32: the 10 queries NEW in round 10, declared order
    "mm_zlib_decode_stats",            # ninth real format: zlib/RFC 1950
    "mm_zlib_corrupt_quarantine",      # zlib error-path value-hash gate
    "stream_corpus_ingest_inbatch",    # in-batch near-dup admission gate
    "bm25_topk_docs",                  # integer BM25 phrase retrieval
    "kanon_user_signatures",           # k-anonymity governance audit
    "emb_label_centroid_drift",        # embedding distribution-shift monitor
    "train_eval_leakage_pairs",        # eval-split decontamination audit
    "mm_warc_http_response_stats",     # raw-crawl WARC/HTTP read path
    "mm_webdataset_tgz_index",         # compressed .tar.gz shard read
    "source_bigram_entropy",           # corpus-diversity dashboard
    # -- slots 33-50: the r6-vintage evidence backlog, oldest first
    #    (CORRECTNESS_r06.json slot order; 18 of 44 — the remaining 26
    #    are the slots-51+ deferrals documented above)
    "dedup_exact_substring_pairs",
    "ks_doclen_source_drift",
    "chisq_type_hour_independence",
    "stream_ivm_retract_deltas",
    "markov_removal_attribution",
    "dq_benford_first_digit",
    "daily_revenue_trailing_range",
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
    # -- slots 51+: work that must NOT displace the rotation above.
    #    The 26 r6-vintage deferrals (oldest evidence in the registry
    #    after the r11 gate; they open the r12 head, r06 slot order).
    #    DECLARED r12 HEAD: the 26 r6 deferrals below, then the two
    #    sketch queries newly oracle-fied in r11 (approx_distinct_users,
    #    hll_sketch_rollup — first hash rows ever), then any queries NEW
    #    in round 11 in their declared order, then the oldest r7-vintage
    #    rows to fill 50.
    "emb_jl_distance_fidelity",
    "kcore_part_affinity",
    "stream_rate_limited_users",
    "text_unigram_surprisal",
    "sql_groupby_all_daily_mix",
    "sim_ivf_cell_balance",
    "lsh_cap_recall_audit",
    "mm_ppm_decode_stats",
    "dedup_minhash_lsh_capped",
    "llm_corpus_stage_report",
    "part_affinity_triangles",
    "metric_bootstrap_ci",
    "value_rank_family",
    "sliding_window_counts",
    "session_windows",
    "stream_user_stats",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_components",
    "text_token_stats",
    "text_lang_id",
    # -- NEW in round 11 (mirror-green at 3 SFs; external rows queued in
    #    the declared r12 head after the 26 r6 deferrals and the two
    #    newly-oracle-fied sketches above)
    "text_winnow_fingerprints",        # MOSS winnowing fingerprint profile
    "dedup_winnow_pairs",              # winnowed-index substring screen
    "winnow_recall_audit",             # screen-vs-truth catch-rate audit
    "hash_xxh64_twin_audit",           # xxhash64 DuckDB twin under the gate
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
