"""Text-analysis operators for LLM training-data pipelines.

Beyond-parity surface (BASELINE.json north star): language ID, quality
scoring, token counting, fingerprinting over a ``documents(doc_id, text,
lang, source, n_chars)`` table. Everything is built-in Column expressions —
no Python UDFs — so a 100 TB corpus scan stays inside whole-stage codegen at
parquet-scan speed; and every operator has an exact DuckDB twin (the
``*_sql`` functions) for oracle verification.

Portability rules used throughout: literal-split counting (``size(split(x,
lit))-1``) instead of engine-specific regex counts; character classes only in
regexes (identical semantics in Java regex and RE2); :func:`...rounding.pround`
for any derived double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hashing import h60, h60_sql
from ..functions.rounding import pround, pround_sql

__all__ = [
    "normalize_text",
    "normalize_text_sql",
    "tokens",
    "tokens_sql",
    "token_count",
    "token_count_sql",
    "bpe_pretokens",
    "bpe_pretoken_count",
    "bpe_pretoken_count_sql",
    "count_occurrences",
    "count_occurrences_sql",
    "lang_scores",
    "lang_scores_sql",
    "predicted_lang",
    "predicted_lang_sql",
    "LANG_MARKERS",
    "quality_metrics",
    "quality_metrics_sql",
    "fingerprint",
    "fingerprint_sql",
    "prefix_fingerprint",
    "prefix_fingerprint_sql",
    "PII_PATTERNS",
    "PII_TOKENS",
    "pii_counts",
    "pii_counts_sql",
    "redact_pii",
    "redact_pii_sql",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------- normalize

def normalize_text(col: Column | str) -> Column:
    """Canonical form for dedup/fingerprinting: lowercase, strip everything
    but [a-z0-9 ], collapse whitespace, trim."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def normalize_text_sql(expr: str) -> str:
    return (
        "trim(regexp_replace(regexp_replace(lower("
        + expr
        + "), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    )


# ------------------------------------------------------------------ tokens

def tokens(col: Column | str) -> Column:
    """Whitespace tokens of already-normalized text (single-space separated)."""
    return F.split(_c(col), " ")


def tokens_sql(expr: str) -> str:
    return f"string_split({expr}, ' ')"


def token_count(col: Column | str) -> Column:
    """Whitespace-split token count of raw text (BPE-agnostic baseline)."""
    return F.size(F.split(F.trim(_c(col)), r"\s+"))


def token_count_sql(expr: str) -> str:
    return f"len(string_split_regex(trim({expr}), '\\s+'))"


# BPE-style pretokenizer (simplified GPT-2 pattern, engine-portable subset):
# a pretoken is a letter run, a single digit, or a single non-alphanumeric
# non-space character. Real BPE then merges within pretokens, so the
# *pretoken* count is the trainable upper bound on BPE token count — the
# quantity corpus dashboards track before a tokenizer even exists. The
# pattern deliberately uses only ASCII classes: \p{L}-style classes differ
# between regex engines, and portability is what makes the count verifiable.
_BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]"


def bpe_pretokens(col: Column | str) -> Column:
    """Array of BPE-style pretokens of raw text."""
    return F.regexp_extract_all(_c(col), F.lit(_BPE_PATTERN), 0)


def bpe_pretoken_count(col: Column | str) -> Column:
    return F.size(bpe_pretokens(col)).cast("long")


def bpe_pretoken_count_sql(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{_BPE_PATTERN}')) AS BIGINT)"


# ----------------------------------------------------- occurrence counting

def count_occurrences(col: Column | str, needle: str) -> Column:
    """Occurrences of a literal substring — split-based, engine-portable."""
    import re

    return F.size(F.split(_c(col), re.escape(needle))) - 1


def count_occurrences_sql(expr: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return f"(len(string_split({expr}, '{esc}')) - 1)"


# ------------------------------------------------------------ language ID

# Marker stopwords per language (surrounded by spaces to match whole words in
# normalized text). An n-gram frequency heuristic — deliberately simple and
# fully engine-portable; plug a real model in via mapInPandas when accuracy
# matters more than scan speed.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of "),
    "es": (" el ", " la ", " que "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " et ", " les "),
}


def lang_scores(norm_col: Column | str) -> dict[str, Column]:
    """Marker-occurrence score per language over normalized text."""
    padded = F.concat(F.lit(" "), _c(norm_col), F.lit(" "))
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        score: Column = F.lit(0)
        for m in markers:
            score = score + count_occurrences(padded, m)
        out[f"score_{lang}"] = score.cast("long")
    return out


def lang_scores_sql(norm_expr: str) -> dict[str, str]:
    padded = f"concat(' ', {norm_expr}, ' ')"
    out: dict[str, str] = {}
    for lang, markers in LANG_MARKERS.items():
        parts = [count_occurrences_sql(padded, m) for m in markers]
        out[f"score_{lang}"] = "CAST((" + " + ".join(parts) + ") AS BIGINT)"
    return out


def predicted_lang(scores: dict[str, Column]) -> Column:
    """Argmax over language scores as a chained CASE; ties broken by the
    LANG_MARKERS order; all-zero scores -> 'und' (undetermined)."""
    langs = list(LANG_MARKERS)
    expr = F.lit("und")
    # Reverse order so earlier languages win ties (CASE evaluates top-down).
    for lang in reversed(langs):
        s = scores[f"score_{lang}"]
        cond = s > 0
        for prior in langs[: langs.index(lang)]:
            cond = cond & (s > scores[f"score_{prior}"])
        for later in langs[langs.index(lang) + 1 :]:
            cond = cond & (s >= scores[f"score_{later}"])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def predicted_lang_sql(score_exprs: dict[str, str]) -> str:
    langs = list(LANG_MARKERS)
    sql = "'und'"
    for lang in reversed(langs):
        s = score_exprs[f"score_{lang}"]
        conds = [f"{s} > 0"]
        for prior in langs[: langs.index(lang)]:
            conds.append(f"{s} > {score_exprs[f'score_{prior}']}")
        for later in langs[langs.index(lang) + 1 :]:
            conds.append(f"{s} >= {score_exprs[f'score_{later}']}")
        sql = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {sql} END"
    return sql


# -------------------------------------------------------- quality scoring

def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Cheap quality signals: length, alpha ratio, whitespace ratio,
    stopword ratio, capped-length score, and a blended 0-1 quality score."""
    c = _c(col)
    length = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))
    spaces = F.length(F.regexp_replace(c, "[^ ]", ""))
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    stop = (
        count_occurrences(padded, " the ")
        + count_occurrences(padded, " and ")
        + count_occurrences(padded, " a ")
    )
    n_tok = token_count(c)
    alpha_ratio = pround(alpha / length, 4)
    ws_ratio = pround(spaces / length, 4)
    stop_ratio = pround(stop / n_tok, 4)
    len_score = pround(F.least(length / F.lit(500.0), F.lit(1.0)), 4)
    quality = pround(
        F.lit(0.4) * alpha_ratio + F.lit(0.3) * len_score + F.lit(0.3) * stop_ratio, 4
    )
    return {
        "length": length.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "alpha_ratio": alpha_ratio,
        "ws_ratio": ws_ratio,
        "stop_ratio": stop_ratio,
        "len_score": len_score,
        "quality": quality,
    }


def quality_metrics_sql(expr: str) -> dict[str, str]:
    length = f"length({expr})"
    alpha = f"length(regexp_replace({expr}, '[^a-zA-Z]', '', 'g'))"
    spaces = f"length(regexp_replace({expr}, '[^ ]', '', 'g'))"
    padded = f"concat(' ', lower({expr}), ' ')"
    stop = " + ".join(
        count_occurrences_sql(padded, w) for w in (" the ", " and ", " a ")
    )
    n_tok = token_count_sql(expr)
    alpha_ratio = pround_sql(f"({alpha}) / ({length})", 4)
    ws_ratio = pround_sql(f"({spaces}) / ({length})", 4)
    stop_ratio = pround_sql(f"({stop}) / ({n_tok})", 4)
    len_score = pround_sql(f"least(({length}) / 500.0, 1.0)", 4)
    quality = pround_sql(
        f"0.4 * ({alpha_ratio}) + 0.3 * ({len_score}) + 0.3 * ({stop_ratio})", 4
    )
    return {
        "length": f"CAST({length} AS BIGINT)",
        "n_tokens": f"CAST({n_tok} AS BIGINT)",
        "alpha_ratio": alpha_ratio,
        "ws_ratio": ws_ratio,
        "stop_ratio": stop_ratio,
        "len_score": len_score,
        "quality": quality,
    }


# ----------------------------------------------------------- PII redaction

# Pattern portability: character classes only ([.] and [+] instead of \. and
# \+, [0-9] instead of \d) so the same string means the same thing to Java
# regex (Spark) and RE2 (DuckDB), and leftmost-first greedy matching agrees.
# Deliberately high-recall/simple — the scan-speed first pass of a PII sweep;
# a model-based NER pass slots in via mapInPandas where precision matters.
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
    "phone": "[+][0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4": "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
}

PII_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}

# Redaction order matters (an email's domain can contain an IP-shaped dotted
# quad; a phone is digit runs): emails first, then phones, then bare IPs.
_PII_ORDER = ("email", "phone", "ipv4")


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category PII match counts (``n_emails``/``n_phones``/``n_ipv4``)."""
    c = _c(col)
    return {
        f"n_{k}s" if k != "ipv4" else "n_ipv4": F.size(
            F.regexp_extract_all(c, F.lit(p), 0)
        ).cast("long")
        for k, p in PII_PATTERNS.items()
    }


def pii_counts_sql(expr: str) -> dict[str, str]:
    return {
        f"n_{k}s" if k != "ipv4" else "n_ipv4": (
            f"CAST(len(regexp_extract_all({expr}, '{p}')) AS BIGINT)"
        )
        for k, p in PII_PATTERNS.items()
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its category token, email->phone->ipv4."""
    c = _c(col)
    for k in _PII_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[k], PII_TOKENS[k])
    return c


def redact_pii_sql(expr: str) -> str:
    for k in _PII_ORDER:
        expr = f"regexp_replace({expr}, '{PII_PATTERNS[k]}', '{PII_TOKENS[k]}', 'g')"
    return expr


# ---------------------------------------------------------- fingerprinting

def fingerprint(col: Column | str) -> Column:
    """Stable 60-bit content fingerprint of normalized text."""
    return h60(normalize_text(col))


def fingerprint_sql(expr: str) -> str:
    return h60_sql(normalize_text_sql(expr))


def prefix_fingerprint(col: Column | str, n_words: int = 8) -> Column:
    """Fingerprint of the first ``n_words`` normalized words — catches
    shared-prefix boilerplate documents."""
    toks = tokens(normalize_text(col))
    return h60(F.concat_ws(" ", F.slice(toks, 1, n_words)))


def prefix_fingerprint_sql(expr: str, n_words: int = 8) -> str:
    toks = tokens_sql(normalize_text_sql(expr))
    return h60_sql(f"array_to_string(list_slice({toks}, 1, {n_words}), ' ')")


# ---------------------------------------------------------- HTML cleaning

# Entity -> replacement, applied in a fixed order (amp LAST so that
# double-escaped text like "&amp;lt;" decodes one level per pass, the
# conventional single-pass behavior). Literal string replaces — no regex —
# so Spark replace() and DuckDB replace() agree byte-for-byte.
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]
# Engine-portable ASCII classes only (same rationale as _BPE_PATTERN):
# tags = a '<', optionally anything non-'>', then '>'; control chars by
# explicit hex range, excluding tab/newline which collapse as whitespace.
_TAG_PATTERN = "<[^>]*>"
_CTRL_PATTERN = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
_WS_PATTERN = "[ \\t\\n\\r]+"


def clean_html(col: Column | str) -> Column:
    """Boilerplate-stage text cleaning: drop ``<...>`` tags, decode the six
    common HTML entities, strip control characters, collapse all whitespace
    runs to single spaces, trim. Every step is a JVM-side regexp_replace /
    replace chain inside whole-stage codegen — no UDF — and each has an
    exact DuckDB twin (:func:`clean_html_sql`), so cleaned text is
    verifiable cross-engine byte-for-byte."""
    c = F.regexp_replace(_c(col), _TAG_PATTERN, " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, _CTRL_PATTERN, " ")
    c = F.regexp_replace(c, _WS_PATTERN, " ")
    return F.trim(c)


def clean_html_sql(expr: str) -> str:
    out = f"regexp_replace({expr}, '{_TAG_PATTERN}', ' ', 'g')"
    for ent, rep in _HTML_ENTITIES:
        rep_sql = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{rep_sql}')"
    out = f"regexp_replace({out}, '{_CTRL_PATTERN}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_WS_PATTERN}', ' ', 'g')"
    return f"trim({out})"
