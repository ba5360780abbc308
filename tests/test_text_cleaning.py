"""clean_html / clean_html_sql cross-engine equivalence on text where the
rules actually fire (the documents fixture contains no markup)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.operators.text import (
    clean_html,
    clean_html_sql,
)

CASES = [
    "<p>Hello <b>world</b></p>",
    "a &amp; b &lt;tag&gt; &quot;quoted&quot; it&#39;s fine",
    "double-escaped &amp;lt;stays-entity&amp;gt;",
    "ctrl\x07chars\x1fstripped\x0bout",
    "  collapse \t all\n\nwhitespace\r\n runs  ",
    "<script>alert('x')</script>text after",
    "<a href='x.html'>link</a>&nbsp;trail",
    "unclosed <tag stays if no gt",
    "plain text is untouched",
    "",
]


def test_clean_html_matches_duckdb_twin(spark):
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i long, t string")
    got = {
        r.i: r.c
        for r in sdf.select("i", clean_html("t").alias("c")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(CASES):
        (want,) = con.execute(
            f"SELECT {clean_html_sql('$tx')}".replace("$tx", "?"), [t]
        ).fetchone()
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_clean_html_semantics(spark):
    sdf = spark.createDataFrame([(t,) for t in CASES], "t string")
    out = [r.c for r in sdf.select(clean_html("t").alias("c")).collect()]
    assert out[0] == "Hello world"
    assert out[1] == "a & b <tag> \"quoted\" it's fine"
    # single-pass entity decode: &amp;lt; -> &lt; (NOT a second decode to <)
    assert out[2] == "double-escaped &lt;stays-entity&gt;"
    assert out[3] == "ctrl chars stripped out"
    assert out[4] == "collapse all whitespace runs"
    assert out[5] == "alert('x') text after"
    assert out[6] == "link trail"
    assert "<" in out[7]  # malformed tag without '>' is preserved
    assert out[8] == "plain text is untouched"
    assert out[9] == ""


def test_bigram_coverage_invariants(spark):
    """text_bigram_coverage: permille in [0, 1000], covered <= total, every
    document scored exactly once, and the reference-df >= 2 rule actually
    bites (some bigram mass is uncovered on the fixture corpus)."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = REGISTRY["text_bigram_coverage"].fn(spark, SF_MED).collect()
    n_docs = (
        REGISTRY["text_token_stats"].fn(spark, SF_MED).count()
    )
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    for r in rows:
        assert 0 <= r.n_covered <= r.n_bigrams
        assert 0 <= r.cov_permille <= 1000
        assert r.cov_permille == (1000 * r.n_covered) // r.n_bigrams
    assert any(r.n_covered > 0 for r in rows)
    assert any(r.n_covered < r.n_bigrams for r in rows)


def test_bpe_train_merges_semantics(spark):
    """The learned merge table: one row per rank, winning counts
    non-increasing (every post-merge pair occurrence existed pre-merge as
    an occurrence of the parent pair, so no later winner can beat an
    earlier one), and greedy-leftmost application semantics on a
    constructed word (overlap case 'aaa' -> [aa, a])."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.plans.registry import REGISTRY
    from stream_processing_pipeline_spark.plans.textq import (
        _bpe_apply_merge,
        _bpe_pair_counts_of,
    )

    from .conftest import SF_MED

    rows = REGISTRY["bpe_train_merges"].fn(spark, SF_MED).collect()
    assert [r.merge_rank for r in rows] == list(range(len(rows)))
    assert len(rows) == 6
    counts = [r.pair_n for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.pair_n > 0 and r.left_sym and r.right_sym for r in rows)

    # Constructed overlap: merging (a, a) on 'aaa' must fuse the LEFTMOST
    # pair only -> symbols [aa, a], i.e. ' aa  a '.
    words = spark.createDataFrame(
        [(" a  a  a ", 1)], "seq string, cnt long"
    )
    best = spark.createDataFrame([("a", "a", 1)], "l string, r string, n long")
    (out,) = _bpe_apply_merge(words, best).collect()
    assert out.seq == " aa  a "
    # And the pair counter sees the fused boundary: pairs of ' aa  a '
    # are exactly {(aa, a): 1}.
    got = {
        (r.l, r.r): r.n
        for r in _bpe_pair_counts_of(
            spark.createDataFrame([(" aa  a ", 1)], "seq string, cnt long")
        ).collect()
    }
    assert got == {("aa", "a"): 1}


def test_bpe_encode_fertility_consistent_with_pretokenizer(spark):
    """Encode-side invariants tying bpe_encode_fertility to the shared
    pretokenizer (text_bpe_token_stats) and to training
    (bpe_train_merges):

    - word conservation: encoding never creates or drops words, so
      sum(n_words) over sources == the corpus pretoken count;
    - token bounds: every word is >= 1 symbol and merges only ever FUSE,
      so n_words <= n_tokens <= per-source pretoken character count;
    - the six learned merges actually fire on the fixture: the corpus
      token total is strictly below the character total by exactly the
      training winners' occurrence mass at the time each merge applied
      (weaker, checkable form: strict inequality);
    - the fertility projection replays its own integer definition.
    """
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators import text as T
    from stream_processing_pipeline_spark.plans.common import catalog
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = REGISTRY["bpe_encode_fertility"].fn(spark, SF_MED).collect()
    assert rows, "fixture has sources"

    docs = catalog(spark, SF_MED).documents
    pre = docs.select(
        "source", F.explode(T.bpe_pretokens("text")).alias("tok")
    )
    ref = {
        r.source: (r.n_pre, r.n_chars)
        for r in pre.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pre"),
            F.sum(F.length("tok")).alias("n_chars"),
        )
        .collect()
    }
    assert {r.source for r in rows} == set(ref)
    for r in rows:
        n_pre, n_chars = ref[r.source]
        assert r.n_words == n_pre
        assert r.n_words <= r.n_tokens <= n_chars
        assert r.fertility_permille == (1000 * r.n_tokens) // r.n_words
        assert r.fertility_permille >= 1000
    # the trained merges fired somewhere: strictly fewer symbols than chars
    assert sum(r.n_tokens for r in rows) < sum(c for _, c in ref.values())


def test_quality_filter_funnel_telescopes(spark):
    """Funnel algebra: stages telescope (each stage's survivors are the
    next stage's input), cascade drops never exceed corpus-wide failures,
    and every stage is load-bearing on the fixture (drops > 0)."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = sorted(
        REGISTRY["quality_filter_funnel"].fn(spark, SF_MED).collect(),
        key=lambda r: r.rule_idx,
    )
    assert [r.rule_idx for r in rows] == list(range(len(rows)))
    n_docs = REGISTRY["text_quality"].fn(spark, SF_MED).count()
    assert rows[0].n_input == n_docs
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_input == prev.n_surviving
    for r in rows:
        assert r.n_surviving == r.n_input - r.n_dropped
        assert r.n_dropped <= r.n_failing_alone
        assert r.n_dropped > 0, f"{r.rule} is dead weight on the fixture"
    assert rows[-1].n_surviving > 0


def test_llm_corpus_stage_report_monotone(spark):
    """Stage survival is monotone non-increasing in docs AND tokens, stage 0
    covers the whole corpus, and the exact-dedup + quality stages actually
    bite on the fixture."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = sorted(
        REGISTRY["llm_corpus_stage_report"].fn(spark, SF_MED).collect(),
        key=lambda r: r.stage_idx,
    )
    assert [r.stage for r in rows] == [
        "raw", "exact_dedup", "near_dedup", "quality_gate", "train_sample"
    ]
    n_docs = REGISTRY["text_token_stats"].fn(spark, SF_MED).count()
    assert rows[0].n_docs == n_docs
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_docs <= prev.n_docs
        assert cur.n_tokens <= prev.n_tokens
    # the sf0.01 fixture happens to contain no exact dups; the stage may
    # be a no-op there (monotonicity above still holds at any SF)
    assert rows[1].n_docs <= rows[0].n_docs
    assert rows[3].n_docs < rows[2].n_docs     # quality gate bites
    assert rows[4].n_docs < rows[3].n_docs     # 80% split bites
    assert rows[4].n_docs > 0
