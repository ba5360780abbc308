"""Misra-Gries heavy hitters: bounded-memory candidates, exact recount.

The sketch family's frequency member (alongside :mod:`.histogram` for
quantiles, :mod:`.bloom` for membership, and HLL for cardinality): find
every key whose global frequency is at least ``N / phi_den`` without ever
shuffling the full key space.

Two phases, the standard production shape for 100 TB corpora:

1. **Candidates** (:func:`mg_candidates`): each input partition maintains a
   Misra-Gries summary of at most ``k`` counters in an Arrow-batched
   ``mapInPandas`` and emits them — at most ``k`` rows per partition plus
   one partition-total row, regardless of partition size or key
   cardinality. The batched eviction (subtract the (k+1)-th largest count
   from all counters, drop the non-positive) removes at least ``(k+1)·δ``
   total mass per δ-subtraction, so any key can lose at most ``n_p/(k+1)``
   of its partition count [Misra & Gries 1982; merged-summary bound per
   Agarwal et al., "Mergeable Summaries", PODS 2012]. Hence every key with
   global count ``> N/(k+1)`` survives in at least one partition: with
   ``k + 1 > phi_den`` the candidate set is a SUPERSET of the true heavy
   hitters — false negatives are impossible.
2. **Exact recount** (:func:`heavy_hitters_exact`): broadcast the candidate
   keys (≤ ``k × n_partitions`` rows by construction), left-semi join to
   drop every non-candidate row BEFORE the aggregation shuffle, count
   exactly, and keep keys with ``n · phi_den ≥ N`` (integer arithmetic, no
   division). False positives from phase 1 are eliminated here, so the
   result equals the plain exact-count query — the technique changes the
   physical plan only, which is what lets a DuckDB oracle verify it.

Phase-1 candidate sets depend on row order within partitions; the final
output does not (superset + exact filter = exact answer for any candidate
set that contains the truth).

The naive plan shuffles every distinct key to a reducer; this plan shuffles
only candidate-key rows (map-side combined) and moves the sketch — bounded
by ``k`` per partition — everywhere else.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mg_candidates", "heavy_hitters_exact"]

def mg_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of the ``key_col`` frequencies.

    Returns ``(key string | NULL, n long)`` rows: for each input partition,
    at most ``k`` surviving counters (``key`` set, ``n`` = the counter's
    lower-bound value) plus exactly one total row (``key`` NULL, ``n`` =
    partition row count). Memory is O(k) per partition; the per-batch merge
    is a vectorized ``value_counts`` + Series add, never a Python row loop.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        total = 0
        for pdf in batches:
            vc = pdf[key_col].value_counts()
            total += int(vc.sum())
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > k:
                # Batched MG eviction: subtracting the (k+1)-th largest
                # value from every counter zeroes out at least |counters|-k
                # of them while removing >= (k+1)*delta total mass.
                delta = int(counters.nlargest(k + 1).iloc[-1])
                counters = counters - delta
                counters = counters[counters > 0]
        out = pd.DataFrame(
            {"key": counters.index.astype(str), "n": counters.to_numpy("int64")}
        )
        # NULL-keyed row = the partition total (lets phase 2 learn N from
        # this same scan instead of a third pass over the data).
        total_row = pd.DataFrame({"key": [None], "n": [total]})
        yield pd.concat([out, total_row], ignore_index=True)

    narrow = df.select(F.col(key_col).cast("string").alias(key_col))
    return narrow.mapInPandas(summarize, "key string, n long")


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    phi_den: int,
    k: int | None = None,
    out_key: str | None = None,
) -> DataFrame:
    """Exact keys with global frequency ``>= N / phi_den``, sketch-pruned.

    ``k`` defaults to ``2 * phi_den`` counters (the no-false-negative bound
    needs only ``k + 1 > phi_den``; the factor 2 halves phase-1 noise for
    free — candidates stay tiny either way). Output: ``(key, n)`` with
    ``n`` the exact count, equal to the naive full-aggregation query.
    """
    k = 2 * phi_den if k is None else k
    if k + 1 <= phi_den:
        raise ValueError(
            f"k={k} breaks the superset guarantee for phi_den={phi_den}: "
            "need k + 1 > phi_den"
        )
    out_key = out_key or key_col
    # Both phase-2 consumers (candidate keys, partition totals) read the
    # summaries; persisting the <= (k+1) x n_partitions rows keeps the
    # sketch pass to ONE scan instead of one per consumer. Bounded by
    # construction; the harnesses clearCache() per query.
    summaries = mg_candidates(df, key_col, k).persist()
    candidates = (
        summaries.filter(F.col("key").isNotNull()).select("key").distinct()
    )
    totals = summaries.filter(F.col("key").isNull()).agg(
        F.sum("n").alias("_N")
    )
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    exact = (
        keyed.join(F.broadcast(candidates), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        exact.join(F.broadcast(totals))
        .filter(F.col("n") * phi_den >= F.col("_N"))
        .select(F.col("key").alias(out_key), "n")
    )


def morton_interleave(x: Column, y: Column, bits: int) -> Column:
    """Z-order (Morton) code: interleave the low ``bits`` bits of two
    non-negative ints, ``x`` in the even positions, ``y`` in the odd.

    Pure integer shift/mask arithmetic inside whole-stage codegen, exactly
    replayable in any SQL engine (:func:`morton_sql`). Sorting or range-
    partitioning a table by this code places rows that are close in BOTH
    dimensions into the same file, so parquet min/max footer stats prune
    2-D predicates — the layout trick behind Delta/Iceberg ``ZORDER BY``.
    """
    code = F.lit(0)
    for i in range(bits):
        code = (
            code.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return code


def morton_sql(x_expr: str, y_expr: str, bits: int) -> str:
    """DuckDB twin of :func:`morton_interleave` (same shift/mask algebra)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"
