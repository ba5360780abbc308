"""Bloom-prefiltered semi-joins: shrink the big side before it shuffles.

The scale problem: ``big LEFT SEMI JOIN keys`` shuffles the entire big side
by key even when only a few percent of rows survive. The standard fix is a
Bloom filter of the key set, broadcast to the scan, applied BEFORE the
shuffle: false positives just ride to the exact join (which removes them),
false negatives cannot happen, so the final result is exact while the
shuffle carries only ``true_rate + fp_rate`` of the rows. Spark's own
runtime row-level filtering (``spark.sql.optimizer.runtime.bloomFilter``)
does this opportunistically; the explicit operator makes the technique
deterministic, inspectable, and usable where the optimizer won't inject it
(streaming micro-batches, pre-computed key sets, cross-job reuse).

Hashing: ``xxhash64`` with k seeds — a fixed, published algorithm
(stable across sessions and Spark versions), and an order of magnitude
cheaper per probe than the repo's md5-based h60 (measured: the 4-probe
prefilter over 600k rows dropped ~8s -> ~1s). Cross-ENGINE portability is
deliberately not required here: build and probe use the same function, so
false negatives are impossible by construction, and the query result never
depends on the bitmap beyond pruning — which is why the queries using this
verify against a plain semi-join oracle. The driver roundtrip is the
BITMAP, not the keys — ``n_bits/8`` bytes regardless of key count (the
build aggregates distinct positions, at most ``n_bits`` rows, before
collect).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_bitmap", "bloom_might_contain", "bloom_prefilter"]

DEFAULT_BITS = 1 << 16
DEFAULT_K = 4


def _positions(key: Column, n_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(n_bits)).cast("long")
        for i in range(k)
    ]


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> list[int]:
    """Build the filter: ``n_bits/64`` signed-long words.

    Distributed everywhere except the final collect, which is bounded by
    ``n_bits`` DISTINCT position rows (8 KiB of bitmap at the default
    size) — independent of how many keys the set holds."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), n_bits, k))).alias("p")
    ).distinct()
    words = [0] * (n_bits // 64)
    for r in pos.collect():
        words[r.p // 64] |= 1 << (r.p % 64)
    # two's-complement into signed longs for the plan literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column | str,
    words: list[int],
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> Column:
    """Membership test column: true for every present key (no false
    negatives by construction), true with probability ~fp_rate for absent
    ones. The bitmap enters the plan as one literal array; each probe is a
    word lookup + bit test."""
    c = F.col(key) if isinstance(key, str) else key
    # F.lit(list) makes ONE compact array Literal; F.array(*1024 children)
    # would inflate the expression tree 4x over (one copy per probe) and
    # push the stage out of whole-stage codegen — measured 5x slower.
    W = F.lit([int(w) for w in words])
    # shiftleft() takes a literal bit count, so single-bit masks come from a
    # 64-entry literal lookup instead (signed two's-complement for bit 63)
    masks = F.lit(
        [(1 << b) - ((1 << 64) if b == 63 else 0) for b in range(64)]
    )
    tests = []
    for pos in _positions(c, n_bits, k):
        word = F.element_at(W, (pos / 64).cast("int") + 1)
        bit = F.element_at(masks, (pos % 64).cast("int") + 1)
        tests.append(word.bitwiseAND(bit) != 0)
    return reduce(lambda a, b: a & b, tests)


def bloom_prefilter(
    df: DataFrame,
    words: list[int],
    key_col: str,
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Keep only rows whose key might be in the set the bitmap was built
    from. Follow with the exact join — this is a shuffle reducer, not a
    replacement for it."""
    return df.filter(bloom_might_contain(key_col, words, n_bits, k))


# ------------------------------------------------- portable (verifiable) form

def portable_positions(key: Column, n_bits: int, k: int) -> list[Column]:
    """md5-derived bit positions (engine-portable, unlike the xxhash64
    fast path above): for queries that MATERIALIZE the bitmap into a
    verified result — the filter words themselves become value-hash-checked
    output, so an independent engine must rebuild them bit-identically."""
    from ..functions.hashing import h60

    return [
        (h60(F.concat(F.lit(f"bf{i}:"), key.cast("string"))) % n_bits)
        for i in range(k)
    ]


def portable_positions_sql(expr: str, n_bits: int, k: int) -> list[str]:
    """DuckDB twin of :func:`portable_positions`."""
    from ..functions.hashing import h60_sql

    out = []
    for i in range(k):
        salted = f"concat('bf{i}:', CAST({expr} AS VARCHAR))"
        out.append(f"({h60_sql(salted)} % {n_bits})")
    return out
