"""PII redaction operators + reaggregatable-sketch rollup.

The PII tests pin the portable-regex contract (same matches in Spark and the
DuckDB oracle is covered by the registry gate; here we pin the *semantics*:
counts, ordering, and that redacted output contains no residual matches).
The HLL tests pin what the rows-only gate can't: merge-vs-direct sketch
equivalence and the estimate's error bound against the exact count.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.operators.text import (
    PII_PATTERNS,
    PII_TOKENS,
    pii_counts,
    redact_pii,
)

SAMPLES = [
    # (text, n_emails, n_phones, n_ipv4)
    ("reach me at jane.doe+spam@mail.example.org thanks", 1, 0, 0),
    ("call +1-800-555-0199 or +44-203-555-0177 now", 0, 2, 0),
    ("server 192.168.0.1 and 10.0.0.255 are up", 0, 0, 2),
    # counts are independent raw-text sweeps per category, so the dotted quad
    # inside the email's domain ALSO counts as an IP (redaction, by contrast,
    # is ordered: the email eats it first — see the ordering tests below)
    ("mixed: bob@10.0.0.1.example.com from 172.16.254.3 +1-555-010-0099", 1, 1, 2),
    ("no pii here, just text with @ and 1.2 numbers", 0, 0, 0),
    ("", 0, 0, 0),
]


def _df(spark):
    return spark.createDataFrame(
        [Row(i=i, text=t) for i, (t, *_e) in enumerate(SAMPLES)]
    )


def test_pii_counts_per_category(spark):
    rows = (
        _df(spark)
        .select("i", *[c.alias(n) for n, c in pii_counts("text").items()])
        .orderBy("i")
        .collect()
    )
    for r, (_t, ne, np_, ni) in zip(rows, SAMPLES):
        assert (r.n_emails, r.n_phones, r.n_ipv4) == (ne, np_, ni), r


def test_redaction_leaves_no_residual_matches(spark):
    red = _df(spark).select("i", redact_pii("text").alias("red"))
    residual = red.select(
        "i",
        *[
            F.size(F.regexp_extract_all("red", F.lit(p), 0)).alias(k)
            for k, p in PII_PATTERNS.items()
        ],
    )
    for r in residual.collect():
        assert r.email == 0 and r.phone == 0 and r.ipv4 == 0, r


def test_redaction_order_email_wins_over_ip():
    # An email whose domain embeds a dotted quad must redact as ONE email,
    # not leave a half-eaten IP behind — pinned via the pure-pandas view of
    # the same patterns to keep the assertion engine-independent.
    import re

    text = "bob@10.0.0.1.example.com"
    out = text
    for k in ("email", "phone", "ipv4"):
        out = re.sub(PII_PATTERNS[k], PII_TOKENS[k], out)
    assert out == "<EMAIL>"


def test_redacted_text_keeps_surroundings(spark):
    row = (
        _df(spark)
        .filter(F.col("i") == 3)
        .select(redact_pii("text").alias("red"))
        .first()
    )
    assert row.red == "mixed: <EMAIL> from <IP> <PHONE>"


def test_hll_merge_equals_direct_and_bounds_error(spark):
    ev = spark.createDataFrame(
        [
            Row(event_type="a" if i % 3 else "b", day=i % 7, user_id=i % 211)
            for i in range(2000)
        ]
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact")
    )
    m = {r.event_type: r.est for r in merged.collect()}
    d = {r.event_type: r.est for r in direct.collect()}
    x = {r.event_type: r.exact for r in exact.collect()}
    # Same lgK union of partials is lossless: merged == direct, exactly.
    assert m == d, (m, d)
    for k, v in x.items():
        assert abs(m[k] - v) / v < 0.05, (k, m[k], v)


def test_kmv_daily_estimates_and_saturation(spark):
    """KMV contract at SF_MED: every day saturates (n_sample == k), the
    estimate is within 30% of exact (k=64 -> ~12.5% std err), and the
    unsaturated branch is exact by construction (pinned on a tiny
    synthetic day via direct recompute)."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = REGISTRY["kmv_distinct_users_daily"].fn(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert r.n_sample <= 64
        if r.n_sample < 64:  # unsaturated -> estimate IS the sample size
            assert r.kmv_estimate == r.n_sample
        assert r.err_permille <= 300, (r.day, r.err_permille)


def test_kmv_set_algebra_bounds(spark):
    """Theta-intersection and union estimates land within 50% of the
    exact values (k=64), and the exact-overlap audit column matches an
    independent two-half recount."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.batch import _LC_SPLIT
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    r = REGISTRY["kmv_set_algebra"].fn(spark, SF_MED).collect()[0]
    ev = catalog(spark, SF_MED).events
    half = F.when(
        F.col("ts") < F.lit(_LC_SPLIT).cast("timestamp_ntz"), 0
    ).otherwise(1)
    per_user = ev.select(half.alias("half"), "user_id").distinct()
    exact_union = per_user.select("user_id").distinct().count()
    exact_overlap = (
        per_user.groupBy("user_id").count().filter(F.col("count") == 2).count()
    )
    assert r.exact_overlap == exact_overlap
    assert abs(r.union_estimate - exact_union) <= exact_union // 2
    if exact_overlap:
        assert abs(r.inter_estimate - exact_overlap) <= exact_overlap // 2
