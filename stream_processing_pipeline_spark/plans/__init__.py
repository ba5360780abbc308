"""Query plans: the engine's registered query set.

Every query is a named pair (Spark callable, DuckDB oracle SQL) registered in
:mod:`.registry`; the driver contract (``__spark_entry__.py``) exposes them
verbatim. Modules:

- :mod:`.parity`     — the six reference queries (SURVEY.md §2.10) mapped onto
  the synthetic ``events`` star schema
- :mod:`.batch`      — batch analytics widening the operator surface: TPC-H-
  style aggregation/join/top-k, analytic window functions, set ops
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

__all__ = ["REGISTRY", "Query", "register", "all_queries", "all_oracles"]

# --------------------------------------------------------------- gate order
# The external correctness gate evaluates queries in registration order and
# each round records exactly the first ~50 registrations, so the gate
# effectively checks a prefix. Registration order is therefore part of the
# verification contract: queries whose driver-side evidence is newest-needed
# come first. Round-3 ordering (VERDICT.md r2 "Next round" #1):
#   1. the 23 queries never gated in r1 or r2 (CORRECTNESS_r01/r02 union);
#   2. mm_format_stats — oracle changed this round (CAST fix for the one r2
#      hash FAIL);
#   3. the trained-IVF pair, which gains value-hash oracles this round
#      (previously rows-only);
#   4. queries NEW in round 3 (inserted at the marker below as added);
#   5. rotation fill: queries whose only green row is from r1 (oldest
#      evidence first);
#   6. everything r2-green sits past the prefix — their green rows describe
#      unchanged code, and the local mirror re-verifies them continuously.
# With r1 ∪ r2 ∪ r3 this makes every registered query driver-verified at
# least once.
_GATE_PRIORITY = [
    # -- never driver-gated in r1 or r2 (VERDICT r2 "What's missing" #1)
    "user_value_minmax_pandas",
    "asof_cogrouped_pandas",
    "text_bpe_token_stats_pandas",
    "mm_decode_arrow",
    "recent_errors_before_purchase",
    "hll_sketch_rollup",
    "user_value_minmax_arrow",
    "user_funnel",
    "rollup_incremental_merge",
    "scd2_user_value_bands",
    "user_retention_cohorts",
    "hourly_purchases_gapfill",
    "event_props_variant",
    "dedup_span_chunks",
    "corpus_pack_sequences",
    "corpus_epoch_shuffle",
    "text_pii_redact",
    "quality_weighted_sample",
    "mixture_token_budget",
    "text_chunks_udtf",
    "sim_recall_lsh_at_k",
    "sim_recall_ivf_static_at_k",
    "tpch_q15_top_supplier",
    # -- changed in round 3: oracle CAST fix for the one r2 hash FAIL
    "mm_format_stats",
    # -- trained-IVF pair: value-hash oracles added in round 3 (were
    #    rows-only no_oracle in r2)
    "sim_ivf_assignments",
    "sim_topk_ivf",
    # -- NEW in round 3 (insert additions here, newest first)
    "trailing_week_active_users",
    "stream_hourly_topk_users",
    "scd2_point_in_time_join",
    "user_value_trend",
    "value_mad_outliers",
    "dedup_edit_distance",
    "user_value_ewma",
    "stream_click_purchase_outer",
    "bucketed_join_revenue",
    "sim_ivfpq_codes",
    "sim_topk_ivfpq",
    "value_outliers_exact",
    "emb_top_pc_power_iteration",
    "sql_recursive_click_streak",
    "stream_session_windows",
    "text_clean_html",
    "heavy_hitters_tokens",
    "layout_zorder_stats",
    "stream_dedup_events",
    "stream_click_purchase_join",
    "hist_value_rollup",
    "bloom_semijoin_nation_suppliers",
    "salted_join_type_stats",
    "text_oov_stats",
    # -- r4 rotation: new-in-r3 queries DEFERRED past the 50-slot gate
    #    prefix (26 carry-over slots + 24 new > 50, so something had to
    #    wait). Each deferred query shares its verified machinery with an
    #    in-prefix sibling gated this round or earlier, and all are green
    #    in the local mirror; they rotate to the r4 prefix head.
    #    (test_registry_gate pins this exact set.)
    "cms_token_freq",               # sibling: heavy_hitters_tokens (in
                                    # prefix; same sketch family + tokenizer)
    "text_bigram_coverage",         # sibling: contamination_bench_overlap
                                    # (same posting-aggregation machinery)
    "cdc_apply_snapshot",           # sibling: scd2_point_in_time_join /
                                    # rollup_incremental_merge (in prefix)
    "cdc_snapshot_diff",            # sibling: cdc_apply_snapshot (same
                                    # max_by LWW core, oracle-pinned as-of)
    "join_key_skew_audit",          # sibling: salted_join_type_stats (in
                                    # prefix; the audit that motivates it)
    "bpe_train_merges",             # sibling: bpe_pair_counts (round-one
                                    # twin) / text_bpe_token_stats (r2)
    "stream_cdc_apply",             # sibling: stream_user_stats (same
                                    # applyInPandasWithState harness, r1)
    "dpp_promo_day_revenue",        # sibling: partition_pruned_daily_stats
                                    # (same partitioned store; DPP is the
                                    # runtime half, plan-pinned)
    "quality_filter_funnel",        # sibling: text_quality /
                                    # corpus_clean_train_sample (r2; same
                                    # metric kernels, new attribution)
    "mm_shard_manifest",            # sibling: corpus_pack_sequences (same
                                    # running-sum packing contract, bytes
                                    # over payloads) + mm_metadata (r2)
    "sim_recall_pq_at_k",           # sibling: sim_recall_ivf_static_at_k
                                    # (in prefix; same eval composition)
    "hourly_anomaly_vs_baseline",   # sibling: value_mad_outliers (in
                                    # prefix; same central-rank median)
    "llm_corpus_stage_report",      # composition of verified kernels:
                                    # dedup_exact + minhash bands +
                                    # quality + split (all gated r1/r2)
    "lc_distinct_users_daily",      # sibling: daily_distinct_users (r1) /
                                    # hll pair (the oracle-able register
                                    # form of the same sketch family)
    "bloom_source_membership_audit", # sibling: bloom_semijoin_nation_
                                    # suppliers (in prefix; this is the
                                    # materialized/verified bitmap form)
    "sim_margin_mined_pairs",       # sibling: sim_topk_bruteforce (r2;
                                    # same broadcast-query scan + window)
    "lc_register_set_algebra",      # sibling: lc_distinct_users_daily
                                    # (same registers; set-op layer)
    "pagerank_trade_network",       # sibling: dedup_components (r1; same
                                    # message-passing + localCheckpoint
                                    # iteration recipe)
    "trade_graph_butterflies",      # sibling: pagerank_trade_network
                                    # (same edge derivation; wedge join)
    "user_growth_accounting",       # sibling: user_retention_cohorts (in
                                    # prefix; same distinct-(user,day) +
                                    # per-user window contract)
    "event_transition_matrix",      # sibling: user_event_type_signature /
                                    # user_funnel (per-user-timeline lag)
    "order_to_ship_latency",        # sibling: value_mad_outliers (central-
                                    # rank picks) + tpch q4/q12 (latency)
    "revenue_concentration_hhi",    # sibling: revenue_by_nation (r1) +
                                    # join_key_skew_audit (share math)
    "part_affinity_pairs",          # sibling: trade_graph_butterflies
                                    # (same wedge join, order-keyed)
    "open_orders_over_time",        # sibling: hourly_purchases_gapfill /
                                    # scd2 spans (day-grain window passes)
    "partition_pruned_daily_stats", # plan contract pinned by its own test;
                                    # layout siblings zorder/bucketing in prefix
    "array_functions_showcase",     # sibling: string/datetime showcases (r1)
    "minhash_jaccard_calibration",  # sibling: dedup_minhash_bands/_lsh (r1)
    "dedup_rate_by_source",         # sibling: dedup_exact machinery (r1)
    "lineitem_measures_unpivot",    # sibling: daily_counts_pivoted (r1)
    "cube_daily_type_counts",       # sibling: rollup/grouping-sets (r1)
    "hist_value_quantiles",         # sibling: hist_value_rollup (in prefix)
    "weighted_priority_sample",     # sibling: stratified/quality samples (r2)
    "bpe_pair_counts",              # sibling: text_bpe_token_stats (r2)
    # -- rotation fill: last green row is from r1; re-verify oldest evidence
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "revenue_by_nation",
    "top_events_per_user",
    "user_running_value",
    "engaged_users_set_ops",
    "daily_distinct_users",
    "approx_distinct_users",
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
    "tpch_q7_supplier_customer_volume",
    "tpch_q14_promo_revenue",
    "dq_lineitem_report",
    "dq_referential_integrity",
    "string_functions_showcase",
    "datetime_functions_showcase",
    # ---- slot ~50 boundary: r1-green continuation (rotates into the r4
    #      prefix if not reached this round)
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
