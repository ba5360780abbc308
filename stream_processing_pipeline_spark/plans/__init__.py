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
# come first. Round-7 ordering (VERDICT.md r6 "Next round" #1):
#   1. queries NEW in round 7 (mm_png_decode_stats and later additions at
#      the marker);
#   2. queries whose plans/semantics CHANGE in round 7: ts_sax_similar_users
#      (index retuned so fixture scale produces collision buckets, VERDICT
#      r6 #2), mm_wav_pcm_stats + mm_tar_member_index (ADVICE r6 decode-
#      path fixes), supplier_part_transit_overlaps + window_funnel_depth
#      (re-expressed through the extracted library operators, VERDICT r6
#      #5 — results hash-unchanged, plans changed);
#   3. the ENTIRE r1/r2 evidence backlog — all 41 queries whose newest
#      external row predates r3 (3 r1-vintage, then 38 r2-vintage in
#      registration order). 4 new + 5 changed + 41 = EXACTLY 50, zero
#      slack: one rotation clears the board (after the r7 gate no
#      registered query's newest external row is older than r3), and any
#      FURTHER r7 head insertion would silently push backlog queries out
#      of the prefix — don't add above this line; late plan changes with
#      fresh rows go AFTER the backlog (see slot 51 below).
# Count the prefix with
#   python -c "from stream_processing_pipeline_spark.plans import
#              REGISTRY; print(list(REGISTRY)[:50])"
# rather than trusting arithmetic in this comment.
# NOTE: hll_sketch_rollup / approx_distinct_users are deliberately OUT of
# the prefix — they are rows-only by design (no_oracle) and can never
# produce a green hash row; spending gate slots on them is waste.
_GATE_PRIORITY = [
    # -- NEW in round 7 (insert additions here, newest first)
    "mm_png_corrupt_quarantine",
    "retrieval_rrf_fusion",
    "customer_inflight_order_overlaps",
    "mm_png_decode_stats",
    # -- plans/semantics changed in round 7
    "ts_sax_similar_users",            # retuned (6 segs, 3 symbols)
    "mm_wav_pcm_stats",                # dup-chunk reject, NULL min/max
    "mm_tar_member_index",             # typeflag '7' indexed
    "supplier_part_transit_overlaps",  # re-expressed via operators.joins.range_join
    "window_funnel_depth",             # re-expressed via operators.aggregates.window_funnel
    # -- the FULL r1/r2 evidence backlog (VERDICT r6 #1): 41 queries whose
    #    newest external row is r1/r2 vintage, oldest evidence first; with
    #    the 6 entries above the prefix clears the entire backlog in one
    #    rotation -- after r7 no registered query's newest external row is
    #    older than r3
    "text_quality",
    "text_fingerprints",
    "quality_by_source",
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
    # -- slot 51+: work that must NOT displace the backlog clear above.
    #    asof_last_click: plan changed in r7 (re-expressed via operators.
    #    joins.asof_join, hash-unchanged at 3 SFs by the local mirror) but
    #    carries an r6-fresh external hash row. mm_jpeg_decode_stats:
    #    registered late in r7 (after the head was frozen at exactly 50);
    #    mirror-green at 3 SFs, external row rolls to the r8 head along
    #    with the asof re-gate — put BOTH at the top of the r8 list.
    "asof_last_click_before_purchase",
    "mm_jpeg_decode_stats",
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
