"""Vector math over ``array<float|double>`` embedding columns.

All JVM-side (no Python UDFs): ``zip_with`` + ``aggregate`` run inside
whole-stage codegen, so brute-force similarity scans stay CPU-bound rather
than serialization-bound. Elements are cast to double *before* arithmetic and
folded left-to-right — the same order DuckDB's ``list_cosine_similarity``
uses — so scores are bit-identical across engines (float->double widening is
exact; IEEE ops on the same operand order are deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import pround, pround_sql

__all__ = ["dot_product", "l2_norm", "cosine_similarity", "cosine_similarity_sql"]


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.aggregate(
        _as_double(a), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str, scale: int = 6) -> Column:
    """Cosine similarity rounded to ``scale`` decimals (cross-engine stable)."""
    sim = dot_product(a, b) / (l2_norm(a) * l2_norm(b))
    return pround(sim, scale)


def cosine_similarity_sql(a: str, b: str, scale: int = 6) -> str:
    """DuckDB twin of :func:`cosine_similarity`."""
    return pround_sql(
        f"list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))",
        scale,
    )
