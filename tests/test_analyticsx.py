"""Semantic invariants for the round-4 extension suite (plans/analyticsx.py
+ dedup_containment_pairs). The DuckDB oracles pin exact values; these pin
the contracts a value-hash can't express: trim bookkeeping, clamp algebra,
correlation bounds, CUSUM telescoping, funnel monotonicity, interval
conservation, mixture upweighting, calibration error bounds, fidelity
monotonicity, and containment-vs-Jaccard dominance."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_pipeline_spark.plans.registry import REGISTRY

from .conftest import SF_MED


def _events(spark):
    from stream_processing_pipeline_spark.plans.common import catalog

    return catalog(spark, SF_MED).events


def test_trimmed_mean_bookkeeping(spark):
    """n_kept = m - 2*(m div 10) per type, and the trimmed mean is the
    integer mean of exactly the kept rows (recomputed independently)."""
    ev = _events(spark)
    m_by_type = {
        r.event_type: r.m
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("m")).collect()
    }
    rows = REGISTRY["trimmed_mean_value_by_type"].fn(spark, SF_MED).collect()
    assert {r.event_type for r in rows} == set(m_by_type)
    for r in rows:
        m = m_by_type[r.event_type]
        assert r.n_kept == m - 2 * (m // 10)
        assert r.trimmed_mean_cents == r.kept_sum_cents // r.n_kept


def test_winsorized_clamp_algebra(spark):
    """p05 <= p95, n matches the type count, and the winsorized sum is
    bracketed by n*p05 and n*p95 (everything got clamped into the band)."""
    rows = REGISTRY["value_winsorized_stats"].fn(spark, SF_MED).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p05_cents <= r.p95_cents
        assert r.n * r.p05_cents <= r.winsorized_sum_cents <= r.n * r.p95_cents


def test_autocorr_bounds_and_pair_counts(spark):
    ev = _events(spark)
    n_days = ev.select(F.col("ts").cast("date")).distinct().count()
    rows = {r.lag: r for r in REGISTRY["daily_counts_autocorr"].fn(spark, SF_MED).collect()}
    assert set(rows) == {1, 7}
    for k, r in rows.items():
        # contiguous fixture days -> exactly n_days - k lagged pairs
        assert r.n_pairs == n_days - k
        assert -1.0 <= r.r_autocorr <= 1.0


def test_cusum_telescopes_to_total_remainder(spark):
    """Σ dev = total - n * (total div n) = total mod n — the final CUSUM
    value is the truncating-mean remainder, in [0, n_days)."""
    rows = sorted(
        REGISTRY["revenue_cusum"].fn(spark, SF_MED).collect(), key=lambda r: r.day
    )
    n = len(rows)
    total = sum(r.rev_cents for r in rows)
    assert rows[-1].cusum_cents == total - n * (total // n)
    assert 0 <= rows[-1].cusum_cents < n
    # cusum is the running sum of devs
    acc = 0
    for r in rows:
        acc += r.dev_cents
        assert r.cusum_cents == acc


def test_strict_funnel_matches_independent_walk(spark):
    """Stage counts equal an independent per-user pandas walk (first view,
    first click strictly after it, first purchase strictly after that),
    and the funnel is monotone non-increasing."""
    ev = _events(spark)
    pdf = ev.select("user_id", "ts", "event_type").toPandas()
    n1 = n2 = n3 = 0
    for _, g in pdf.groupby("user_id"):
        views = g[g.event_type == "view"].ts
        if views.empty:
            continue
        n1 += 1
        tv = views.min()
        clicks = g[(g.event_type == "click") & (g.ts > tv)].ts
        if clicks.empty:
            continue
        n2 += 1
        tc = clicks.min()
        if not g[(g.event_type == "purchase") & (g.ts > tc)].empty:
            n3 += 1
    rows = {r.stage: r for r in REGISTRY["strict_funnel_conversion"].fn(spark, SF_MED).collect()}
    assert [rows[s].n_users for s in (1, 2, 3)] == [n1, n2, n3]
    assert n1 >= n2 >= n3
    assert rows[1].conv_permille == 1000
    assert rows[2].conv_permille == (1000 * n2) // n1
    assert rows[3].conv_permille == (1000 * n3) // n2


def test_reorder_interval_conservation(spark):
    """n_intervals = n_orders - n_customers_with_orders (each customer's
    first order opens no interval), and the quantiles are ordered."""
    from stream_processing_pipeline_spark.plans.common import catalog

    o = catalog(spark, SF_MED).orders
    n_orders = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    r = REGISTRY["orders_reorder_interval"].fn(spark, SF_MED).collect()[0]
    assert r.n_intervals == n_orders - n_cust
    assert 0 <= r.p50_days <= r.p90_days <= r.max_days


def test_temperature_weights_upweight_small_sources(spark):
    """sqrt-temperature sampling must move share FROM the largest source
    TO the smallest (the whole point of the knob); truncating permilles
    sum to <= 1000."""
    rows = REGISTRY["mixture_temperature_weights"].fn(spark, SF_MED).collect()
    assert sum(r.raw_permille for r in rows) <= 1000
    assert sum(r.temp_permille for r in rows) <= 1000
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    if smallest.n_tokens < largest.n_tokens:  # guard equal-size fixtures
        assert smallest.temp_permille >= smallest.raw_permille
        assert largest.temp_permille <= largest.raw_permille


def test_source_divergence_bounds(spark):
    rows = REGISTRY["source_token_divergence"].fn(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert 0 <= r.tv_permille <= 1000
        assert r.n_tokens > 0


def test_tfidf_ranks_are_dense_and_ordered(spark):
    rows = REGISTRY["text_tfidf_top_terms"].fn(spark, SF_MED).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(r.tf >= 1 and r.score >= 1000 for r in rs)  # idf >= 1000/df... >= 1 permille scale


def test_hist_quantile_error_bounded_by_bin_width(spark):
    """The histogram estimate (upper bin edge) can never undershoot the
    exact quantile and errs by less than one bin width — the contract that
    justifies the sort-free path at scale."""
    from stream_processing_pipeline_spark.operators.histogram import (
        DEFAULT_WIDTH_CENTS,
    )

    rows = REGISTRY["hist_quantile_calibration"].fn(spark, SF_MED).collect()
    assert len(rows) == 5
    for r in rows:
        for err in (r.err50_cents, r.err90_cents):
            assert 0 <= err < DEFAULT_WIDTH_CENTS


def test_matryoshka_fidelity_monotone(spark):
    rows = REGISTRY["emb_matryoshka_fidelity"].fn(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.fidelity16 <= r.fidelity32 <= 1.0 + 1e-9


def test_containment_dominates_jaccard_and_flags_subsets(spark):
    """containment = i/min-side >= i/union = Jaccard for every candidate
    pair; subset_dup iff max containment >= 90%."""
    rows = REGISTRY["dedup_containment_pairs"].fn(spark, SF_MED).collect()
    assert rows
    for r in rows:
        union = r.na + r.nb - r.inter_sh
        j_pct = (100 * r.inter_sh) // union
        assert max(r.cont_a_pct, r.cont_b_pct) >= j_pct
        assert r.subset_dup == (1 if max(r.cont_a_pct, r.cont_b_pct) >= 90 else 0)
        assert 0 <= r.cont_a_pct <= 100 and 0 <= r.cont_b_pct <= 100
