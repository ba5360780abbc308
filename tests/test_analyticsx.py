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


# ----------------------------- late-r4 batch (deferred past the r4 prefix)


def test_rarity_score_identities(spark):
    """Σ n_tokens over docs = corpus N; a hapax-holding doc's rarity_sum
    >= N (the hapax alone contributes N div 1); rarity_per_token is the
    truncating per-token mean."""
    rows = REGISTRY["text_rarity_score"].fn(spark, SF_MED).collect()
    from stream_processing_pipeline_spark.operators.text import (
        normalize_text,
        tokens,
    )
    from stream_processing_pipeline_spark.plans.common import catalog

    d = catalog(spark, SF_MED).documents
    n_corpus = d.select(
        F.explode(tokens(normalize_text("text"))).alias("t")
    ).count()
    assert sum(r.n_tokens for r in rows) == n_corpus
    for r in rows:
        assert r.rarity_per_token == r.rarity_sum // r.n_tokens
        # every token contributes at least N div c_max >= 1
        assert r.rarity_sum >= r.n_tokens


def test_overlapping_chunks_cover_and_overlap(spark):
    """Per doc: chunk 0 starts the doc, consecutive chunks overlap by
    window - stride tokens (except a short tail), and the chunk count
    matches the stride formula on the doc's token count."""
    from stream_processing_pipeline_spark.operators.text import (
        normalize_text,
        token_count,
    )
    from stream_processing_pipeline_spark.plans.common import catalog

    d = catalog(spark, SF_MED).documents
    n_by_doc = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id", token_count(normalize_text("text")).alias("n")
        ).collect()
    }
    rows = REGISTRY["text_chunks_overlapping"].fn(spark, SF_MED).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    W, S = 16, 8
    for doc, rs in by_doc.items():
        n = n_by_doc[doc]
        expect = 1 if n <= W else 1 + -(-(n - W) // S)
        assert len(rs) == expect, (doc, n)
        rs.sort(key=lambda r: r.chunk_no)
        assert [r.chunk_no for r in rs] == list(range(len(rs)))
        for i, r in enumerate(rs):
            assert r.n_chunk_tokens == min(W, n - S * i)


def test_time_to_convert_consistent_with_funnel(spark):
    """n_converters equals the strict funnel's stage-3 count; quantiles
    ordered and positive (strictly-after semantics forbid zero-minute
    equality only when sub-minute, so >= 0)."""
    f = {r.stage: r for r in REGISTRY["strict_funnel_conversion"].fn(spark, SF_MED).collect()}
    r = REGISTRY["funnel_time_to_convert"].fn(spark, SF_MED).collect()[0]
    assert r.n_converters == f[3].n_users
    assert 0 <= r.p50_minutes <= r.p90_minutes <= r.max_minutes


def test_monthly_trend_matches_numpy_ols(spark):
    """The integer OLS slope equals floor-div of the numpy-exact rational
    slope computed from the same month aggregate."""
    from stream_processing_pipeline_spark.plans.common import catalog

    li = catalog(spark, SF_MED).lineitem
    m = (
        li.select(
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 23941)
            .cast("long").alias("x"),
            F.round(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
            ).cast("long").alias("cv4"),
        )
        .groupBy("x")
        .agg(F.expr("sum(cv4) div 100").alias("y"))
        .collect()
    )
    xs = [r.x for r in m]
    ys = [r.y for r in m]
    n = len(xs)
    num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(a * a for a in xs) - sum(xs) ** 2
    r = REGISTRY["monthly_revenue_trend"].fn(spark, SF_MED).collect()[0]
    assert r.n_months == n
    # Spark/DuckDB `div` truncates toward zero; Python // floors — align.
    q = abs(num) // den * (1 if num >= 0 else -1)
    assert r.slope_cents2_per_month == q
    assert r.min_month_cents2 == min(ys) and r.max_month_cents2 == max(ys)


def test_brand_share_drift_shares_and_bounds(spark):
    """Per month, shares are <= 1000 permille each; drift bounded by the
    max share; every brand row carries first/last shares."""
    rows = REGISTRY["brand_share_drift"].fn(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert r.n_months >= 1
        for v in (r.first_share_pm, r.last_share_pm):
            assert v is None or 0 <= v <= 1000
        assert r.max_drift_pm is None or 0 <= r.max_drift_pm <= 1000


def test_curation_report_consistent_with_standalone_kernels(spark):
    """Every column of the per-source curation report must agree with the
    standalone verified query it composes (same definitions, same
    numbers) — the property that makes the dashboard trustworthy."""
    rep = {
        r.source: r
        for r in REGISTRY["source_curation_report"].fn(spark, SF_MED).collect()
    }
    div = {
        r.source: r
        for r in REGISTRY["source_token_divergence"].fn(spark, SF_MED).collect()
    }
    wts = {
        r.source: r
        for r in REGISTRY["mixture_temperature_weights"].fn(spark, SF_MED).collect()
    }
    assert set(rep) == set(div) == set(wts)
    # containment-side consistency: total subset-dup docs across sources
    # equals the distinct docs in subset pairs of the standalone query
    pairs = REGISTRY["dedup_containment_pairs"].fn(spark, SF_MED).collect()
    sub_docs = {
        d for r in pairs if r.subset_dup for d in (r.doc_a, r.doc_b)
    }
    assert sum(r.n_subset_dup for r in rep.values()) == len(sub_docs)
    for src, r in rep.items():
        assert r.tv_permille == div[src].tv_permille
        assert r.n_docs == wts[src].n_docs
        # weights here are over normalized-token counts (vs raw-token in
        # the standalone) — same ordering, not necessarily same value
        assert 0 <= r.temp_permille <= 1000
        assert 0 <= r.n_exact_dup < r.n_docs
        assert 0 <= r.n_subset_dup <= r.n_docs
        assert r.mean_rarity_per_token >= 1
        assert r.n_chunks >= r.n_docs  # every doc yields >= 1 chunk


def test_int8_recall_beats_pq_recall(spark):
    """The compression/recall trade the two coding audits exist to expose:
    SQ8 (4x compression) must recover most of the exact float top-10 where
    PQ (32x) collapses on this near-uniform fixture — per-query hit counts
    stay in [0, k], recall replays n_hits/k exactly, and mean int8 recall
    strictly dominates mean PQ recall with room to spare."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    i8 = REGISTRY["sim_recall_int8_at_k"].fn(spark, SF_MED).collect()
    pq = REGISTRY["sim_recall_pq_at_k"].fn(spark, SF_MED).collect()
    assert len(i8) == len(pq) > 0
    for r in i8 + pq:
        assert 0 <= r.n_hits <= 10
        assert abs(r.recall_at_k - r.n_hits / 10.0) < 1e-12
    mean_i8 = sum(r.recall_at_k for r in i8) / len(i8)
    mean_pq = sum(r.recall_at_k for r in pq) / len(pq)
    assert mean_i8 >= 0.5, mean_i8          # 4x coding keeps the ranking
    assert mean_i8 > mean_pq + 0.3, (mean_i8, mean_pq)


def test_vocab_growth_bookkeeping(spark):
    """Heaps-law audit algebra: 16 shards partition the corpus, novelty
    sums to the corpus vocabulary (= the final cumulative value), the
    first shard's terms are all new, per-shard novelty never exceeds the
    terms present, the cumulative curve is nondecreasing, and token
    instances reconcile with a direct corpus count. (On this fixture the
    31-term synthetic vocabulary saturates at shard 0 — the flat curve IS
    the 'diversity exhausted' reading the query exists to expose.)"""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators import text as T
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = sorted(
        REGISTRY["vocab_growth_by_shard"].fn(spark, SF_MED).collect(),
        key=lambda r: r.shard,
    )
    assert [r.shard for r in rows] == sorted({r.shard for r in rows})
    assert rows[0].n_new_terms == rows[0].n_distinct_terms
    cum = 0
    for r in rows:
        assert 0 <= r.n_new_terms <= r.n_distinct_terms <= r.n_tokens
        cum += r.n_new_terms
        assert r.cum_vocab == cum
    d = catalog(spark, SF_MED).documents
    tok = d.select(F.explode(T.tokens(T.normalize_text("text"))).alias("t"))
    assert sum(r.n_tokens for r in rows) == tok.count()
    assert cum == tok.select("t").distinct().count()


def test_bootstrap_ci_brackets_and_narrows(spark):
    """Poisson-bootstrap CI invariants: the interval is ordered and
    brackets the point estimate at both fixture SFs, the replicate count
    is the constant, n reconciles with a direct purchase count, repeated
    evaluation is bit-identical (derandomized draws), and the interval
    NARROWS with ~10x more samples — the 1/sqrt(n) behavior that makes
    the number worth publishing next to the metric."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED, SF_SMALL

    out = {}
    for sf in (SF_SMALL, SF_MED):
        (row,) = REGISTRY["metric_bootstrap_ci"].fn(spark, sf).collect()
        n_direct = (
            catalog(spark, sf).events
            .filter(F.col("event_type") == "purchase")
            .count()
        )
        assert row.n_samples == n_direct
        assert row.n_boot == 32
        assert row.ci_lo_cents <= row.point_mean_cents <= row.ci_hi_cents
        assert row.ci_lo_cents < row.ci_hi_cents
        out[sf] = row
        (again,) = REGISTRY["metric_bootstrap_ci"].fn(spark, sf).collect()
        assert again == row  # deterministic end to end
    w_small = out[SF_SMALL].ci_hi_cents - out[SF_SMALL].ci_lo_cents
    w_med = out[SF_MED].ci_hi_cents - out[SF_MED].ci_lo_cents
    assert w_med < w_small  # ~10x the samples -> visibly tighter interval


def test_cdc_chunks_survive_insertion_where_fixed_stride_does_not(spark):
    """The property content-defined chunking exists for: after inserting
    one token at the FRONT of a document, (a) almost all CDC chunk hashes
    survive (only the chunk containing the edit re-hashes), while (b) a
    fixed-stride chunking of the same pair shares almost nothing (every
    window shifts by one). Also pins the chunk algebra: chunks concatenate
    back to the normalized text, and boundaries land only on tokens whose
    hash is 0 mod d (or the final token)."""
    import hashlib

    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators.dedup import cdc_chunks

    def h60_py(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    d = 4  # small modulus so a ~200-token doc has many chunks
    words = [f"w{h60_py(str(i)) % 9973}" for i in range(200)]
    base = " ".join(words)
    shifted = "inserted " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id", cdc_chunks("text", d).alias("ch"), F.col("text")
    ).collect()
    ch = {r.doc_id: r.ch for r in rows}
    # chunk algebra: concatenation restores the normalized text
    for r in rows:
        assert " ".join(ch[r.doc_id]) == r.text.lower()
    # every chunk's LAST token is a boundary token (hash 0 mod d), except
    # possibly the final chunk
    for doc_chunks in ch.values():
        for c in doc_chunks[:-1]:
            assert h60_py(c.split(" ")[-1]) % d == 0
    a, b = set(ch[1]), set(ch[2])
    assert len(a) > 20  # the modulus actually chunked the doc
    # (a) CDC: all of the base doc's chunks except (at most) the first
    # survive the front insertion
    assert len(a & b) >= len(a) - 1
    # (b) fixed stride 8: the same pair shares (almost) no chunks
    fixed = {
        doc: {
            " ".join(toks[i : i + 8])
            for i in range(0, len(toks), 8)
        }
        for doc, toks in ((1, words), (2, ["inserted"] + words))
    }
    assert len(fixed[1] & fixed[2]) <= 1


def test_pipe_syntax_and_variant_match_classic_paths(spark):
    """The two Spark 4 SQL-surface queries must agree with their classic
    equivalents computed through the DataFrame API: pipe syntax's
    post-aggregation WHERE == groupBy().filter() (HAVING), and the VARIANT
    typed path read == get_json_object string extraction — same engine,
    two front-ends, identical rows."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.functions.money import cents
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    ev = catalog(spark, SF_MED).events

    pipe = {
        r.user_id: (r.n_purchases, r.spend_cents)
        for r in REGISTRY["sql_pipe_heavy_purchasers"].fn(spark, SF_MED).collect()
    }
    classic = {
        r.user_id: (r.n, r.s)
        for r in ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents("value")).alias("s"))
        .filter(F.col("n") >= 3)
        .collect()
    }
    assert pipe == classic and len(pipe) > 0

    var = {
        r.k: r.n
        for r in REGISTRY["props_variant_topk"].fn(spark, SF_MED).collect()
    }
    gjo = {
        r.k: r.n
        for r in ev.select(
            F.get_json_object("props", "$.k").cast("long").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "k")
        .limit(10)
        .collect()
    }
    assert var == gjo and len(var) == 10


def test_rfm_segments_reconcile_and_quintile(spark):
    """RFM grid bookkeeping: scores live in 1..5, user and money totals
    reconcile with direct purchase aggregates, the segment label replays
    the score rule, and each dimension's histogram-walk thresholds
    produce roughly-quintile marginals (<=50% in any one score — ties on
    the coarse recency domain chunk buckets, which is the documented
    upper-edge behavior, but no bucket may swallow the population)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.functions.money import cents
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = REGISTRY["user_rfm_segments"].fn(spark, SF_MED).collect()
    assert rows
    p = catalog(spark, SF_MED).events.filter(
        F.col("event_type") == "purchase"
    )
    (direct,) = p.agg(
        F.countDistinct("user_id").alias("u"),
        F.sum(cents("value")).alias("m"),
    ).collect()
    assert sum(r.n_users for r in rows) == direct.u
    assert sum(r.monetary_cents for r in rows) == direct.m
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        if r.r_score >= 4 and r.f_score >= 4 and r.m_score >= 4:
            want = "champion"
        elif r.r_score <= 2 and r.f_score >= 4:
            want = "at_risk_loyal"
        elif r.r_score <= 2 and r.f_score <= 2:
            want = "hibernating"
        else:
            want = "core"
        assert r.segment == want
    for dim in ("r_score", "f_score", "m_score"):
        marg = Counter()
        for r in rows:
            marg[getattr(r, dim)] += r.n_users
        assert len(marg) >= 3
        assert max(marg.values()) <= direct.u // 2


def test_triangle_count_matches_bruteforce(spark):
    """Degree-ordered triangle counting verified against an independent
    brute-force count in plain Python over the same thresholded edge set
    (sf0.001: ~2.3k edges, 3.3k triangles — big enough to exercise real
    orientation ties, small enough to enumerate): triangle total, wedge
    total (sum of C(d,2)), and the transitivity identity must all agree
    exactly."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_SMALL

    (row,) = REGISTRY["part_affinity_triangles"].fn(spark, SF_SMALL).collect()

    op = (
        catalog(spark, SF_SMALL).lineitem
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = op.select("o", F.col("p").alias("x"))
    b = op.select(F.col("o").alias("o2"), F.col("p").alias("y"))
    edges = {
        (r.x, r.y)
        for r in a.join(
            b, (F.col("o") == F.col("o2")) & (F.col("x") < F.col("y"))
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= 2)
        .collect()
    }
    assert row.n_edges == len(edges)
    adj: dict = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    assert row.n_wedges == sum(
        len(ns) * (len(ns) - 1) // 2 for ns in adj.values()
    )
    tri = sum(
        1
        for u, ns in adj.items()
        for v, w in combinations(sorted(n for n in ns if n > u), 2)
        if w in adj[v]
    )
    assert row.n_triangles == tri
    assert row.transitivity_permille == (3000 * tri) // row.n_wedges


def test_triangle_basket_cap_bounds_bot_cart(spark, tmp_path):
    """Planted bot cart (VERDICT r5 #3): two identical 50-item orders would
    emit C(50,2)=1225 edges (and C(50,2) pairs per order in the edge-gen
    join) without the cap; with the 32-item basket cap the query must see
    exactly the 32 partkey-smallest items per order — C(32,2)=496 edges,
    C(32,3)=4960 triangles — and the truncation must pick the SMALLEST
    partkeys (deterministic), not an arbitrary subset."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stream_processing_pipeline_spark.plans.batch import (
        _TRI_BASKET_CAP,
        part_affinity_triangles,
    )

    parts = [100 + 3 * i for i in range(50)]  # 50 distinct partkeys
    ok, pk = [], []
    for o in (1, 2):  # two identical carts -> every pair has support 2
        ok += [o] * len(parts)
        pk += parts
    pq.write_table(
        pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                  "l_partkey": pa.array(pk, pa.int64())}),
        tmp_path / "lineitem.parquet",
    )
    (row,) = part_affinity_triangles(spark, str(tmp_path)).collect()
    cap = _TRI_BASKET_CAP
    assert row.n_edges == cap * (cap - 1) // 2
    assert row.n_triangles == cap * (cap - 1) * (cap - 2) // 6
    # complete graph on the cap-smallest parts: transitivity = 1000 permille
    assert row.transitivity_permille == 1000


def test_lsh_cap_recall_audit_invariants(spark):
    """Recall-audit consistency: candidate and caught counts nest
    (capped <= uncapped <= everything), and on the driver fixtures —
    where no band bucket exceeds the 64 cap — the capped join must
    sacrifice EXACTLY zero true pairs (the registered justification for
    shipping the capped join as the production default)."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    (r,) = REGISTRY["lsh_cap_recall_audit"].fn(spark, SF_MED).collect()
    assert r.caught <= r.n_true
    assert r.n_cand_capped <= r.n_cand
    assert r.caught_capped <= r.caught
    assert r.n_true > 0  # the fixture plants real near-dups
    # fixture buckets max out at 4 << 64: cap is a provable no-op here
    assert r.n_cand_capped == r.n_cand
    assert r.recall_capped_permille == r.recall_permille


def test_ivf_cell_balance_reconciles_with_assignments(spark):
    """Load-balance audit must reconcile with the assignment table it
    audits: vector total equals the corpus, used+empty equals k, min/max
    bracket every observed occupancy, imbalance >= 1000 permille (max is
    at least the mean by definition)."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY
    from stream_processing_pipeline_spark.plans.similarq import _K_STATIC

    (r,) = REGISTRY["sim_ivf_cell_balance"].fn(spark, SF_MED).collect()
    n_emb = catalog(spark, SF_MED).embeddings.count()
    assert r.n_vectors == n_emb
    assert r.n_cells_used + r.n_cells_empty == _K_STATIC
    assert 0 < r.min_occ <= r.max_occ
    assert r.imbalance_permille >= 1000

    occ = (
        REGISTRY["sim_ivf_static_assignments"].fn(spark, SF_MED)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("lo"), F.max("n").alias("hi"))
        .collect()[0]
    )
    assert (occ.lo, occ.hi) == (r.min_occ, r.max_occ)


def test_groupby_all_reconciles_with_event_totals(spark):
    """GROUP BY ALL surface: grouping must be exactly (day, event_type) —
    row count equals the distinct pair count and n_events sums to the
    full event total (nothing dropped or double-grouped)."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    out = REGISTRY["sql_groupby_all_daily_mix"].fn(spark, SF_MED)
    rows = out.collect()
    ev = catalog(spark, SF_MED).events
    n_pairs = (
        ev.select(F.to_date("ts").alias("d"), "event_type").distinct().count()
    )
    assert len(rows) == n_pairs
    assert sum(r.n_events for r in rows) == ev.count()


def test_unigram_surprisal_reconciles_and_bounds(spark):
    """Surprisal reconciliation: per-doc token totals sum to the corpus
    token count, every mean is inside the feasible [0, bits(N)*1000]
    band, and the flag column replays the threshold exactly."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators.text import (
        normalize_text,
        tokens,
    )
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    rows = REGISTRY["text_unigram_surprisal"].fn(spark, SF_MED).collect()
    d = catalog(spark, SF_MED).documents
    n_corpus = d.select(
        F.explode(tokens(normalize_text("text")))
    ).count()
    assert sum(r.n_tokens for r in rows) == n_corpus
    max_bits = n_corpus.bit_length()
    corpus_mean = (
        1000 * sum(r.total_surprisal_bits for r in rows)
    ) // n_corpus
    for r in rows:
        assert 0 <= r.mean_surprisal_millibits <= max_bits * 1000
        assert r.high_surprisal == (
            1 if r.mean_surprisal_millibits > corpus_mean else 0
        )
    # both tails must exist on the fixture for the flag to mean anything
    assert any(r.high_surprisal == 1 for r in rows)
    assert any(r.high_surprisal == 0 for r in rows)


def test_interval_bucket_join_is_complete(spark):
    """The week-bucket candidate generator must be COMPLETE: the bucketed
    plan's pair set equals the direct (s, p)-blocked range-predicate join
    (the oracle form) computed independently in Spark — no overlapping
    pair straddles buckets unseen, no double-match survives the
    distinct."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    got = {
        (r.suppkey, r.partkey, r.okey_a, r.line_a, r.okey_b, r.line_b,
         r.overlap_days)
        for r in REGISTRY["supplier_part_transit_overlaps"]
        .fn(spark, SF_MED).collect()
    }
    cat = catalog(spark, SF_MED)
    li = (
        cat.lineitem.select(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"),
            F.col("l_orderkey").alias("o"),
            F.col("l_linenumber").cast("long").alias("ln"),
            F.to_date("l_shipdate").alias("d1"),
        )
        .join(
            cat.orders.select(
                F.col("o_orderkey").alias("o"),
                F.to_date("o_orderdate").alias("d0"),
            ),
            "o",
        )
        .filter(F.col("d0") <= F.col("d1"))
    )
    a, b = li.alias("a"), li.alias("b")
    direct = a.join(
        b,
        (F.col("a.s") == F.col("b.s")) & (F.col("a.p") == F.col("b.p"))
        & (
            (F.col("a.o") < F.col("b.o"))
            | ((F.col("a.o") == F.col("b.o")) & (F.col("a.ln") < F.col("b.ln")))
        )
        & (F.col("a.d0") <= F.col("b.d1")) & (F.col("b.d0") <= F.col("a.d1")),
    ).select(
        F.col("a.s"), F.col("a.p"), F.col("a.o"), F.col("a.ln"),
        F.col("b.o").alias("ob"), F.col("b.ln").alias("lnb"),
        (F.datediff(F.least("a.d1", "b.d1"), F.greatest("a.d0", "b.d0"))
         .cast("long") + 1).alias("od"),
    )
    want = {tuple(r) for r in direct.collect()}
    assert got == want and len(got) > 0


def test_kcore_peeling_matches_bruteforce(spark):
    """k-core peeling verified against an independent plain-Python peel
    over the same thresholded edge set at sf0.001 AND sf0.01 (the sf0.01
    graph actually cascades: 1880 -> 1573 -> 1538 -> 1535 survivors) —
    every round's (n_nodes, n_edges) must agree exactly, and once two
    consecutive rounds agree the curve must be flat (peeling is
    monotone: a fixpoint cannot un-fix)."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.batch import (
        _KCORE_K,
        _KCORE_ROUNDS,
        _TRI_BASKET_CAP,
        _TRI_MIN_SUPPORT,
    )
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED, SF_SMALL

    for sf in (SF_SMALL, SF_MED):
        rows = REGISTRY["kcore_part_affinity"].fn(spark, sf).collect()
        assert [r.round for r in rows] == list(range(_KCORE_ROUNDS + 1))

        from pyspark.sql import Window as _W

        wb = _W.partitionBy("o").orderBy("p")
        op = (
            catalog(spark, sf).lineitem
            .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
            .distinct()
            .withColumn("rn_", F.row_number().over(wb))
            .filter(F.col("rn_") <= _TRI_BASKET_CAP)
            .drop("rn_")
        )
        a = op.select("o", F.col("p").alias("x"))
        b = op.select(F.col("o").alias("o2"), F.col("p").alias("y"))
        edges = {
            (r.x, r.y)
            for r in a.join(
                b, (F.col("o") == F.col("o2")) & (F.col("x") < F.col("y"))
            )
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).alias("s"))
            .filter(F.col("s") >= _TRI_MIN_SUPPORT)
            .collect()
        }
        adj: dict = {}
        for x, y in edges:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        cur = set(edges)
        expect = [(len(adj), len(cur))]
        nodes = set(adj)
        for _ in range(_KCORE_ROUNDS):
            deg: dict = {}
            for x, y in cur:
                deg[x] = deg.get(x, 0) + 1
                deg[y] = deg.get(y, 0) + 1
            nodes = {n for n in nodes if deg.get(n, 0) >= _KCORE_K}
            cur = {(x, y) for x, y in cur if x in nodes and y in nodes}
            expect.append((len(nodes), len(cur)))
        got = [(r.n_nodes, r.n_edges) for r in rows]
        assert got == expect, f"{sf}: {got} != {expect}"
        # monotone fixpoint: once flat, stays flat
        for i in range(1, len(got)):
            if got[i] == got[i - 1]:
                assert all(g == got[i] for g in got[i:])
                break


def test_jl_projection_distortion_concentrates(spark):
    """JL guarantee sanity on the fidelity audit: with k=16 Rademacher
    projections the distortion ratio has mean 1 and std ~sqrt(2/k)=0.35,
    so (a) the full C(64,2) pair sample must be accounted for, (b) the
    count-weighted mean bucket must sit near 1.0, and (c) the extreme
    ratio must respect the chi-square(k)/k tail: P(ratio > 3.5) ~ 5e-6,
    so over 2016 pairs an excursion past 3.5 means the sign matrix or
    the k-scaling is wrong, not bad luck (observed max on the fixture:
    2.86)."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = REGISTRY["emb_jl_distance_fidelity"].fn(spark, SF_MED).collect()
    n = sum(r.n_pairs for r in rows)
    assert n == 64 * 63 // 2
    mean_micro = (
        sum(r.n_pairs * (r.bucket * 100000 + 50000) for r in rows) // n
    )
    assert 800000 <= mean_micro <= 1200000, mean_micro
    assert min(r.min_ratio_micro for r in rows) >= 0
    assert max(r.max_ratio_micro for r in rows) <= 3500000


def test_range_partition_plan_balances(spark):
    """The exact-quantile boundary planner must produce near-ideal fill:
    every partition's permille share within [500, 1500] (cents ties can
    skew individual partitions but not 1.5x on this distribution), all 16
    partitions present, row counts summing to the non-null total, and
    partition value ranges non-overlapping in pid order."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = sorted(
        REGISTRY["range_partition_plan"].fn(spark, SF_MED).collect(),
        key=lambda r: r.pid,
    )
    assert [r.pid for r in rows] == list(range(16))
    n_total = (
        catalog(spark, SF_MED).events.filter(F.col("value").isNotNull()).count()
    )
    assert sum(r.n_rows for r in rows) == n_total
    for r in rows:
        assert 500 <= r.fill_permille <= 1500, (r.pid, r.fill_permille)
    for a, b in zip(rows, rows[1:]):
        assert a.max_cents <= b.min_cents


def test_bitmap_index_matches_direct_distinct_join(spark):
    """The bitmap set algebra must give the SAME cardinalities as the
    naive distinct-set computation it replaces (the oracle replays the
    bitmap algebra, so this is the independent check that the index is a
    physical structure, not a different answer): per-type user counts and
    every pairwise intersection recomputed from raw distinct sets."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = REGISTRY["bitmap_user_type_index"].fn(spark, SF_MED).collect()
    sets: dict = {}
    for r in (
        catalog(spark, SF_MED)
        .events.select("event_type", "user_id")
        .distinct()
        .collect()
    ):
        sets.setdefault(r.event_type, set()).add(r.user_id)
    expect = {
        (a, b): (
            len(sets[a]),
            len(sets[b]),
            len(sets[a] & sets[b]),
            len(sets[a] | sets[b]),
        )
        for a, b in combinations(sorted(sets), 2)
    }
    got = {
        (r.type_a, r.type_b): (r.n_a, r.n_b, r.n_both, r.n_either)
        for r in rows
    }
    assert got == expect


def test_pareto_frontier_matches_bruteforce(spark):
    """Skyline cross-check: the two-phase bucketed scan must equal the
    O(n^2) no-dominator definition computed independently in plain Python
    at sf0.001 — and every returned point must be mutually non-dominated."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.functions.money import cents
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_SMALL

    got = {
        (r.p_partkey, r.price_cents, r.p_size)
        for r in REGISTRY["pareto_frontier_parts"].fn(spark, SF_SMALL).collect()
    }
    pts = [
        (r.p_partkey, r.c, r.p_size)
        for r in catalog(spark, SF_SMALL)
        .part.select("p_partkey", cents("p_retailprice").alias("c"), "p_size")
        .collect()
    ]
    expect = {
        (k, p, s)
        for k, p, s in pts
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for _, p2, s2 in pts
        )
    }
    assert got == expect and got
    for k, p, s in got:
        for k2, p2, s2 in got:
            assert not (p2 <= p and s2 >= s and (p2 < p or s2 > s)) or (
                (k, p, s) == (k2, p2, s2)
            )


def test_km_survival_monotone_and_consistent(spark):
    """Kaplan–Meier invariants: survival starts at factor(0), is strictly
    a running truncated product (S_k == (S_{k-1} * (n-d)) div n), is
    non-increasing, at-risk counts strictly decrease with week, and the
    at-risk count at week 0 equals the total observation count (every
    gap + one censored tail per customer)."""
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = sorted(
        REGISTRY["order_gap_survival"].fn(spark, SF_MED).collect(),
        key=lambda r: r.wk,
    )
    assert rows[0].survival_micro == rows[0].factor_micro
    s = rows[0].survival_micro
    for prev, r in zip(rows, rows[1:]):
        assert r.n_at_risk < prev.n_at_risk
        s = (s * (r.n_at_risk - r.n_events)) // r.n_at_risk
        assert r.survival_micro == s
        assert r.survival_micro <= prev.survival_micro
    o = catalog(spark, SF_MED).orders
    n_orders = o.count()
    # every order contributes exactly one observation: a gap to the next
    # order, or (for each customer's last order) a censored tail
    assert rows[0].n_at_risk == n_orders


def test_exact_substring_pairs_verbatim_and_alignment(spark):
    """Exact-substring dedup cross-checks: (a) every reported pair at
    sf0.001 really shares a verbatim 16-token window (recomputed in plain
    Python from the raw texts), with n_shared_spans equal to the true
    shared-window count; (b) the alignment claim — a 16-token span
    planted at offsets that straddle the 16-token chunk grid shares ZERO
    strided chunks but is found by the all-offset windows."""
    from stream_processing_pipeline_spark.operators.text import (
        normalize_text,
    )
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_SMALL

    rows = REGISTRY["dedup_exact_substring_pairs"].fn(spark, SF_SMALL).collect()
    assert rows, "fixture's planted near-dups must surface"
    texts = {
        r.doc_id: r.norm
        for r in catalog(spark, SF_SMALL)
        .documents.select("doc_id", normalize_text("text").alias("norm"))
        .collect()
    }

    def windows(s: str, n: int = 16) -> set:
        t = s.split(" ")
        return {tuple(t[i : i + n]) for i in range(len(t) - n + 1)}

    for r in rows:
        shared = windows(texts[r.doc_a]) & windows(texts[r.doc_b])
        assert len(shared) == r.n_shared_spans, (r.doc_a, r.doc_b)
        assert r.min_overlap_tokens == r.n_shared_spans + 15

    # (b) alignment: span S planted at offset 7 in A and offset 3 in B —
    # both misaligned to the 16-token chunk grid, differently
    span = [f"s{i}" for i in range(16)]
    a = [f"a{i}" for i in range(7)] + span + [f"a{i}" for i in range(7, 20)]
    b = [f"b{i}" for i in range(3)] + span + [f"b{i}" for i in range(3, 20)]

    def chunks(t, n=16):
        return {tuple(t[i : i + n]) for i in range(0, len(t) - n + 1, n)}

    assert not (chunks(a) & chunks(b))          # strided chunks: blind
    assert tuple(span) in (windows(" ".join(a)) & windows(" ".join(b)))


def test_customer_inflight_overlaps_match_direct_range_join(spark):
    """The customer-grain interval report built on operators.joins.range_join
    must equal the direct range-predicate pair join computed independently
    in Spark (completeness + no double count across the pair normalization
    and aggregation)."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    got = {
        (r.custkey, r.n_inflight_pairs, r.max_overlap_days)
        for r in REGISTRY["customer_inflight_order_overlaps"]
        .fn(spark, SF_MED).collect()
    }
    cat = catalog(spark, SF_MED)
    iv = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("d1"))
        .join(
            cat.orders.select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.col("o_custkey").alias("c"),
                F.to_date("o_orderdate").alias("d0"),
            ),
            "l_orderkey",
        )
        .filter(F.col("d0") <= F.col("d1"))
    )
    a = iv.select("c", F.col("l_orderkey").alias("oa"),
                  F.col("d0").alias("a0"), F.col("d1").alias("a1"))
    b = iv.select(F.col("c").alias("cb"), F.col("l_orderkey").alias("ob"),
                  F.col("d0").alias("b0"), F.col("d1").alias("b1"))
    direct = (
        a.join(
            b,
            (F.col("c") == F.col("cb"))
            & (F.col("oa") < F.col("ob"))
            & (F.col("a0") <= F.col("b1"))
            & (F.col("b0") <= F.col("a1")),
        )
        .groupBy(F.col("c").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(
                F.datediff(F.least("a1", "b1"), F.greatest("a0", "b0"))
                .cast("long") + 1
            ).alias("mx"),
        )
    )
    want = {(r.custkey, r.n, r.mx) for r in direct.collect()}
    assert got == want and want


def test_rrf_fusion_scores_recompute_from_channels(spark):
    """Every fused row's score and channel count must recompute exactly
    from the two channel rankings, and fused ranks must be dense 1..k per
    query with the documented tie-break (score desc, neighbor_id asc)."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators.similarity import (
        topk_bruteforce,
        topk_int8,
    )
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    rows = REGISTRY["retrieval_rrf_fusion"].fn(spark, SF_MED).collect()
    emb = catalog(spark, SF_MED).embeddings
    queries = emb.filter(F.col("vec_id") < 5)
    br = {
        (r.query_id, r.neighbor_id): r.rank
        for r in topk_bruteforce(emb, queries, k=10).collect()
    }
    i8 = {
        (r.query_id, r.neighbor_id): r.rank
        for r in topk_int8(emb, queries, k=10).collect()
    }
    # full fused candidate set, recomputed independently
    fused = {}
    for key in set(br) | set(i8):
        s = 0
        n = 0
        for ch in (br, i8):
            if key in ch:
                s += 1000000 // (60 + ch[key])
                n += 1
        fused[key] = (s, n)
    by_q = {}
    for r in rows:
        assert fused[(r.query_id, r.neighbor_id)] == (r.rrf_micro, r.n_channels)
        by_q.setdefault(r.query_id, []).append(
            (r.fused_rank, r.rrf_micro, r.neighbor_id)
        )
    for q, lst in by_q.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        assert len(lst) == 10
        # the reported top-k must BE the top-k of the recomputed candidates
        cand = sorted(
            ((s, -nid) for (qq, nid), (s, _n) in fused.items() if qq == q),
            reverse=True,
        )[: len(lst)]
        assert [(s, -nid) for s, nid in
                [(x[1], x[2]) for x in lst]] == [(s, n) for s, n in cand]


def test_png_quarantine_splits_exactly_and_ok_stats_match_strict(spark):
    """Quarantine accounting: exactly the corrupted docs (doc_id % 7 == 3)
    fail, all as crc_mismatch; every surviving doc's stats equal the
    STRICT decoder's output row for row."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    rows = REGISTRY["mm_png_corrupt_quarantine"].fn(spark, SF_MED).collect()
    strict = {
        r.doc_id: (r.n_pixels, r.sum_r + r.sum_g + r.sum_b)
        for r in REGISTRY["mm_png_decode_stats"].fn(spark, SF_MED).collect()
    }
    assert len(rows) == len(strict)
    for r in rows:
        if r.doc_id % 7 == 3:
            assert (r.ok, r.err_class, r.n_pixels, r.sum_rgb) == (
                False, "crc_mismatch", None, None,
            )
        else:
            assert r.ok and r.err_class is None
            assert (r.n_pixels, r.sum_rgb) == strict[r.doc_id]
