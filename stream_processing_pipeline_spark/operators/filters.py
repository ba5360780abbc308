"""Filter operators (reference P7-P10).

These preserve the reference's exact NULL semantics, which are easy to get
silently wrong (SURVEY.md §7.3):

- The recomputed-total check sums components with SQL NULL propagation: if
  any component is NULL the sum is NULL, the discrepancy predicate is NULL,
  and the row is NOT flagged unless the observed total itself is NULL
  (``/root/reference/src/spark_streaming.py:199-207``).
- Disjunctive range filters drop NULL-valued rows (NULL comparisons are
  neither true nor false).

All are plain Column predicates: Catalyst pushes them into the parquet scan
(``PushedFilters`` in explain) wherever the source supports it, which at
100 TB is the difference between scanning a table and scanning a slice.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["outside_range", "discrepancy_filter", "not_null"]


def outside_range(col: Column | str, lo: float, hi: float) -> Column:
    """``col < lo OR col > hi`` (reference P7: abnormal trip duration,
    ``/root/reference/src/spark_streaming.py:162``)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c < lo) | (c > hi)


def discrepancy_filter(
    df: DataFrame,
    observed: str,
    components: list[str],
    tolerance: float = 1.0,
    out: str = "discrepancy",
) -> DataFrame:
    """Flag rows where |observed - sum(components)| > tolerance OR observed IS NULL.

    NULL propagation is intentional and reference-exact (P8/P9): a NULL
    component nullifies the recomputed sum and the row passes unflagged
    unless ``observed`` is NULL.
    """
    calc = reduce(add, [F.col(c) for c in components])
    diff = F.abs(F.col(observed) - calc)
    flagged = df.withColumn(out, diff)
    return flagged.filter((F.col(out) > tolerance) | F.col(observed).isNull())


def not_null(df: DataFrame, *cols: str) -> DataFrame:
    """Reference P10 (``isNotNull`` before aggregation)."""
    pred = reduce(lambda a, b: a & b, [F.col(c).isNotNull() for c in cols])
    return df.filter(pred)
