"""Cross-engine deterministic rounding.

``round(x, 2)`` is NOT portable across engines for doubles: Spark rounds via
exact decimal expansion (Java BigDecimal HALF_UP) while DuckDB rounds with C
floating-point arithmetic — they can disagree in the last digit near ties.
``pround`` instead uses only IEEE-deterministic primitives, identically on
both engines: ``floor(x * 10^s + 0.5) / 10^s`` (round-half-toward-+inf).
Given the same input double, both engines produce the same output double —
which is what hash-verified correctness needs.

Rounding a double to an *integer* (``round(x)``) IS portable (both engines
round half away from zero on the same double), which is why the money helpers
use plain ``round`` for the cents conversion.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["pround", "pround_sql"]


def pround(col: Column, scale: int = 2) -> Column:
    m = float(10**scale)
    return F.floor(col * m + F.lit(0.5)) / m


def pround_sql(expr: str, scale: int = 2) -> str:
    m = float(10**scale)
    return f"floor(({expr}) * {m} + 0.5) / {m}"
