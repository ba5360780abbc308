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
# come first. Round-9 ordering (VERDICT.md r8 "Next round" #1, executed to
# the slot):
#   1. the r8-declared r9 head, verbatim: user_value_minmax_pandas (the
#      documented r8 slot-51 deferral -- r3-vintage external row, Arrow
#      twin gated green in r8) followed by the ten queries NEW in round 8
#      in their declared order. 11 slots.
#   2. 39 of the 47 oracle-bearing queries whose newest external row is
#      r4-vintage, oldest evidence first (registration order within the
#      equal-vintage set). 11 + 39 = EXACTLY 50, zero slack. The 8
#      r4-vintage queries that do not fit (value_winsorized_stats through
#      hist_quantile_calibration below) are deferred to slots 51+ and
#      form the FIRST entries of the r10 gate head; every one stays
#      mirror-verified at 3 SFs per commit. After the r9 gate, every
#      registered query's newest external row is r4+ with r4 itself down
#      to those 8 documented deferrals (plus the two never-gated
#      no_oracle sketches and any query first registered in r9).
# Count the prefix with
#   python -c "from stream_processing_pipeline_spark.plans import
#              REGISTRY; print(list(REGISTRY)[:50])"
# rather than trusting arithmetic in this comment.
# NOTE: hll_sketch_rollup / approx_distinct_users are deliberately OUT of
# the prefix -- they are rows-only by design (no_oracle) and can never
# produce a green hash row; spending gate slots on them is waste.
_GATE_PRIORITY = [
    # -- the r8-declared r9 head (VERDICT r8 #1): do not displace
    "user_value_minmax_pandas",        # r8 slot-51 deferral, re-gate first
    "error_click_reaction_windows",    # timestamp-axis range_join consumer
    "mm_jpeg_ac_decode_stats",         # JPEG AC run-length path gate
    "stream_corpus_ingest",            # streaming LLM-ingest composition
    "window_funnel_strict_depths",     # strict_order funnel mode consumer
    "asof_next_purchase_after_error",  # forward-direction asof consumer
    "seq_match_view_click_purchase",   # any-anchor sequenceMatch operator
    "window_funnel_dedup_depths",      # strict_dedup funnel mode consumer
    "seq_match_signup_then_quick_buy",  # mixed-gap sequenceMatch consumer
    "mm_gif_decode_stats",             # sixth real codec: GIF87a / LZW
    "mm_gif_corrupt_quarantine",       # GIF error-path value-hash gate
    # -- the r4-vintage evidence backlog, oldest first (39 of 47; the
    #    remaining 8 are the slots-51+ deferrals documented above)
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    "tpch_q7_supplier_customer_volume",
    "lineitem_measures_unpivot",
    "cube_daily_type_counts",
    "array_functions_showcase",
    "cdc_apply_snapshot",
    "cdc_snapshot_diff",
    "join_key_skew_audit",
    "hourly_anomaly_vs_baseline",
    "lc_distinct_users_daily",
    "lc_register_set_algebra",
    "pagerank_trade_network",
    "trade_graph_butterflies",
    "user_growth_accounting",
    "event_transition_matrix",
    "order_to_ship_latency",
    "revenue_concentration_hhi",
    "part_affinity_pairs",
    "open_orders_over_time",
    "stream_cdc_apply",
    "dedup_rate_by_source",
    "minhash_jaccard_calibration",
    "dedup_containment_pairs",
    "text_bigram_coverage",
    "bpe_pair_counts",
    "bpe_train_merges",
    "quality_filter_funnel",
    "sim_recall_pq_at_k",
    "sim_margin_mined_pairs",
    "mm_shard_manifest",
    "tpch_q18_large_volume_customers",
    "hist_value_quantiles",
    "cms_token_freq",
    "weighted_priority_sample",
    "partition_pruned_daily_stats",
    "dpp_promo_day_revenue",
    "bloom_source_membership_audit",
    "trimmed_mean_value_by_type",
    # -- slots 51+: work that must NOT displace the rotation above.
    #    First the 8 r4-vintage deferrals (oldest evidence in the
    #    registry after the r9 gate; they open the r10 head), then
    #    queries NEW in round 9 (mirror-green at 3 SFs, no external row
    #    until r10 by the zero-slack rotation above).
    "value_winsorized_stats",
    "revenue_cusum",
    "strict_funnel_conversion",
    "orders_reorder_interval",
    "mixture_temperature_weights",
    "source_token_divergence",
    "text_tfidf_top_terms",
    "hist_quantile_calibration",
    # -- NEW in round 9 (r10 head continues here)
    "mm_gif_dict_decode_stats",        # dictionary-path LZW value hash
    "seq_count_error_purchase_bursts",  # sequence_count consumer
    "stream_corpus_ingest_two_phase",  # cross-batch near-dup admission
    "lm_bigram_perplexity_filter",     # cross-corpus bigram LM filter
    "sim_topk_ivfpq_rerank",           # two-stage IVFADC + exact rerank
    "corpus_remove_dup_spans",         # span dedup as a transform
    "mm_zip_decode_stats",             # seventh real format: ZIP/DEFLATE
    "mm_zip_corrupt_quarantine",       # ZIP error-path value-hash gate
    "revenue_attribution_ushaped",     # integer multi-touch attribution
    "sim_recall_ivfpq_rerank_at_k",    # what the rerank buys, audited
    "mm_gzip_decode_stats",            # eighth real format: gzip/RFC1952
    "mm_gzip_corrupt_quarantine",      # gzip error-path value-hash gate
    "mm_warc_wet_ingest_stats",        # Common Crawl read path end-to-end
    "session_paths_topk",              # gap-sessionized top paths
    "stream_wet_corpus_ingest",        # WET shards -> deduped corpus
    "cohort_ltv_curves",               # per-cohort cumulative LTV
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
