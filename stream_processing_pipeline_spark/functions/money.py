"""Exact money aggregation.

The reference stores money as ``double`` and aggregates with ``avg``
(``/root/reference/src/spark_streaming.py:247-250``). Distributed
floating-point summation is order-dependent: the same query can produce
last-ulp-different results run-to-run (and engine-to-engine), which breaks
hash-verified correctness and is a real reproducibility hazard on a
1000-executor cluster. These helpers aggregate fixed-decimal money exactly by
summing integer cents (associative, overflow-safe to ~9e16 cents) and only
converting back to double at the end — a single deterministic division.

``cents``/``cents_sql`` round the double to an integer cent count, which is
portable across engines (see :mod:`.rounding`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import pround, pround_sql

__all__ = [
    "cents",
    "cents_sql",
    "sum_money",
    "avg_money",
    "sum_money_sql",
    "avg_money_sql",
]


def cents(col: Column | str, scale: int = 2) -> Column:
    """Exact integer representation of a fixed-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 10**scale).cast("long")


def cents_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(round(({expr}) * {10**scale}) AS BIGINT)"


def sum_money(col: Column | str, scale: int = 2) -> Column:
    """Exact sum of a fixed-decimal money column, returned as double."""
    return F.sum(cents(col, scale)) / float(10**scale)


def sum_money_sql(expr: str, scale: int = 2) -> str:
    return f"sum({cents_sql(expr, scale)}) / {float(10 ** scale)}"


def avg_money(col: Column | str, scale: int = 2, out_scale: int = 2) -> Column:
    """Exact-sum average of a fixed-decimal money column (double, rounded)."""
    c = cents(col, scale)
    return pround(F.sum(c) / float(10**scale) / F.count(c), out_scale)


def avg_money_sql(expr: str, scale: int = 2, out_scale: int = 2) -> str:
    c = cents_sql(expr, scale)
    return pround_sql(f"sum({c}) / {float(10 ** scale)} / count({c})", out_scale)
