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
# come first. Round-10 ordering (VERDICT.md r9 "Next round" #1, executing
# the r9-declared head to the slot):
#   1. the 8 r4-vintage deferrals from the zero-slack r9 rotation
#      (value_winsorized_stats .. hist_quantile_calibration), verbatim in
#      their declared order — the oldest external evidence left in the
#      registry. 8 slots.
#   2. the 16 queries NEW in round 9, in their declared
#      plans/__init__.py slots-51+ order (mirror-green at 3 SFs all
#      round, no external row yet by the zero-slack rotation). 16 slots.
#   3. 26 of the 48 oracle-bearing queries whose newest external row is
#      r5-vintage, oldest evidence first (CORRECTNESS_r05.json slot
#      order within the equal-vintage set): kmv_distinct_users_daily
#      through tpch_q1_pricing_summary. 8 + 16 + 26 = EXACTLY 50, zero
#      slack. The 22 r5-vintage queries that do not fit
#      (tpch_q3_shipping_priority .. grouping_sets_revenue, r05 slot
#      order) are deferred to slots 51+ and form the FIRST entries of
#      the r11 gate head; every one keeps its r5 driver row and stays
#      mirror-verified at 3 SFs per commit. After the r10 gate, every
#      registered query's newest external row is r5+ with r5 itself down
#      to those 22 documented deferrals (plus the two never-gated
#      no_oracle sketches and any query first registered in r10).
# Count the prefix with
#   python -c "from stream_processing_pipeline_spark.plans import
#              REGISTRY; print(list(REGISTRY)[:50])"
# rather than trusting arithmetic in this comment.
# NOTE: hll_sketch_rollup / approx_distinct_users are deliberately OUT of
# the prefix -- they are rows-only by design (no_oracle) and can never
# produce a green hash row; spending gate slots on them is waste.
_GATE_PRIORITY = [
    # -- slots 1-8: the r4-vintage deferrals (r9 zero-slack overflow),
    #    declared r10-head-first in r9; oldest evidence in the registry
    "value_winsorized_stats",
    "revenue_cusum",
    "strict_funnel_conversion",
    "orders_reorder_interval",
    "mixture_temperature_weights",
    "source_token_divergence",
    "text_tfidf_top_terms",
    "hist_quantile_calibration",
    # -- slots 9-24: the 16 queries NEW in round 9, declared order
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
    # -- slots 25-50: the r5-vintage evidence backlog, oldest first
    #    (CORRECTNESS_r05.json slot order; 26 of 48 — the remaining 22
    #    are the slots-51+ deferrals documented above)
    "kmv_distinct_users_daily",
    "kmv_set_algebra",
    "sql_lateral_top_orders",
    "text_rarity_score",
    "text_chunks_overlapping",
    "funnel_time_to_convert",
    "monthly_revenue_trend",
    "brand_share_drift",
    "source_curation_report",
    "user_rfm_segments",
    "sql_pipe_heavy_purchasers",
    "props_variant_topk",
    "dedup_cdc_chunk_pairs",
    "sim_recall_int8_at_k",
    "vocab_growth_by_shard",
    "zorder_layout_audit",
    "bpe_encode_fertility",
    "daily_counts_autocorr",
    "emb_matryoshka_fidelity",
    "q1_typed_events",
    "q2_abnormal_minutes",
    "q3_value_discrepancy",
    "q4_avg_value_per_hour",
    "q5_event_counts_per_hour",
    "q6_counts_by_segment",
    "tpch_q1_pricing_summary",
    # -- slots 51+: work that must NOT displace the rotation above.
    #    First the 22 r5-vintage deferrals (oldest evidence in the
    #    registry after the r10 gate; they open the r11 head, r05 slot
    #    order), then the queries NEW in round 10 (mirror-green at 3 SFs,
    #    no external row until r11 by the zero-slack rotation).
    #    DECLARED r11 HEAD: the 22 r5 deferrals below, then the 10
    #    r10-new queries in list order (22 + 10 = 32 slots), then 18 of
    #    the 44 r6-vintage queries oldest-evidence-first
    #    (CORRECTNESS_r06.json slot order, starting
    #    dedup_exact_substring_pairs, ks_doclen_source_drift, ...) —
    #    32 + 18 = exactly 50; the 26 r6 rows that do not fit defer to
    #    the r12 head by the same rule.
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
    # -- NEW in round 10 (mirror-green at 3 SFs; the r11 head continues
    #    here after the 22 r5 deferrals above)
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
