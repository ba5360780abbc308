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
# come first. Round-4 ordering (VERDICT.md r3 "Next round" #1-#3):
#   1. the 34 queries deferred past the r3 prefix (never driver-gated;
#      pinned in tests/test_registry_gate.py) — mirror-green all round 3,
#      now rotated to the head for their first external row;
#   2. the four TPC-H queries whose plans CHANGE this round (forced
#      broadcast of sf-proportional sides removed, VERDICT r3 "What's
#      wrong" #1) — re-gated on the new plans. The other four changed
#      queries (order_to_ship_latency, open_orders_over_time,
#      part_affinity_pairs, trade_graph_butterflies) are already in set 1;
#   3. queries NEW in round 4 (inserted at the marker below as added);
#   4. rotation fill: oldest-evidence r1-green queries;
#   5. everything r2/r3-green sits past the prefix — their green rows
#      describe unchanged code, and the local mirror re-verifies them
#      continuously.
# NOTE: hll_sketch_rollup / approx_distinct_users are deliberately OUT of
# the prefix — they are rows-only by design (no_oracle) and can never
# produce a green hash row; spending gate slots on them is waste
# (VERDICT r3 "Next round" #1).
_GATE_PRIORITY = [
    # -- the 34 queries deferred past the r3 gate prefix (first external row)
    "cms_token_freq",
    "text_bigram_coverage",
    "cdc_apply_snapshot",
    "cdc_snapshot_diff",
    "join_key_skew_audit",
    "bpe_train_merges",
    "stream_cdc_apply",
    "dpp_promo_day_revenue",
    "quality_filter_funnel",
    "mm_shard_manifest",
    "sim_recall_pq_at_k",
    "hourly_anomaly_vs_baseline",
    "llm_corpus_stage_report",
    "lc_distinct_users_daily",
    "bloom_source_membership_audit",
    "sim_margin_mined_pairs",
    "lc_register_set_algebra",
    "pagerank_trade_network",
    "trade_graph_butterflies",
    "user_growth_accounting",
    "event_transition_matrix",
    "order_to_ship_latency",
    "revenue_concentration_hhi",
    "part_affinity_pairs",
    "open_orders_over_time",
    "partition_pruned_daily_stats",
    "array_functions_showcase",
    "minhash_jaccard_calibration",
    "dedup_rate_by_source",
    "lineitem_measures_unpivot",
    "cube_daily_type_counts",
    "hist_value_quantiles",
    "weighted_priority_sample",
    "bpe_pair_counts",
    # -- plans changed in round 4: forced broadcasts of sf-proportional
    #    sides removed (VERDICT r3 "What's wrong" #1) — re-gate on the
    #    new physical plans
    "tpch_q5_local_supplier_volume",
    "tpch_q7_supplier_customer_volume",
    "tpch_q8_market_share",
    "tpch_q18_large_volume_customers",
    # -- NEW in round 4 (insert additions here, newest first)
    "trimmed_mean_value_by_type",
    "value_winsorized_stats",
    "daily_counts_autocorr",
    "revenue_cusum",
    "strict_funnel_conversion",
    "orders_reorder_interval",
    "mixture_temperature_weights",
    "source_token_divergence",
    "text_tfidf_top_terms",
    "hist_quantile_calibration",
    "emb_matryoshka_fidelity",
    "dedup_containment_pairs",
    # -- rotation fill: oldest-evidence (r1) green rows, re-verified if
    #    the prefix reaches them
    "tpch_q1_pricing_summary",
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
    "value_rank_family",
    "sliding_window_counts",
    "session_windows",
    "asof_last_click_before_purchase",
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
    "text_quality",
    "text_fingerprints",
    "quality_by_source",
]
# Queries not named above (the r2-green set) keep registration order after
# the list — their driver rows are freshest, and every one is still
# re-verified per-commit by the local mirror (tools/driver_sim.py /
# tests/test_oracle_correctness.py).


def _apply_gate_priority() -> None:
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    for name, q in REGISTRY.items():
        ordered.setdefault(name, q)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_gate_priority()
