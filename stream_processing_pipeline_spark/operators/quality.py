"""Declarative data-quality checks — the validation stage of a data pipeline.

A check is (name, violation predicate); :func:`run_checks` evaluates all of
them in ONE scan pass (conditional counts — the same single-shuffle idiom as
the reference's pivoted aggregations) and returns a per-check report row:
``check, violations, total, pass``. Referential checks
(:func:`fk_violations`) are broadcast anti-joins against the dimension.

At 100 TB this shape matters: N checks cost one table scan, not N; an FK
check never shuffles the fact side. Reports are tiny and append cleanly to a
quality-history table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Check", "run_checks", "fk_violations"]


class Check:
    """A named violation predicate: rows where ``predicate`` is TRUE fail."""

    def __init__(self, name: str, predicate: Column):
        self.name = name
        self.predicate = predicate


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in one aggregation pass over one scan."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in checks:
        aggs.append(
            F.count(F.when(c.predicate, 1)).alias(f"__v_{c.name}")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c.name}', __v_{c.name}" for c in checks)
    return wide.select(
        F.expr(f"stack({len(checks)}, {stack_args}) AS (`check`, violations)"),
        F.col("__total").alias("total"),
    ).select(
        "check",
        "violations",
        "total",
        (F.col("violations") == 0).alias("pass"),
    )


def fk_violations(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Rows of ``fact`` whose key has no match in ``dim`` (left-anti
    equi-join; NULL keys excluded — nullability is a separate check).

    The referenced table is usually itself a fact-grain key set (orders,
    part, customer) that grows with scale factor, so no broadcast hint:
    the anti-join shuffles both sides on the key, and AQE broadcasts the
    referenced side only when it genuinely fits."""
    return fact.filter(F.col(fact_key).isNotNull()).join(
        dim.select(dim_key),
        F.col(fact_key) == F.col(dim_key),
        "left_anti",
    )
