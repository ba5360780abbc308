"""The six reference transformations as pure DataFrame->DataFrame functions.

Shared by the batch query registry (:mod:`.parity`) and the streaming
topology (:mod:`..streaming.topology`) so stream/batch equivalence holds by
construction — the same Catalyst plan runs in both modes, streaming merely
adding a watermark (reference W1) and incremental state.

Semantics cites are in :mod:`.parity`; this module is the single source of
truth for the transformation logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import avg_money
from ..functions.rounding import pround
from ..operators.aggregates import windowed_agg
from ..operators.filters import discrepancy_filter, not_null, outside_range
from ..operators.joins import dim_join
from ..operators.project import minutes_since_midnight, parse_json_column, prune

__all__ = [
    "typed_events",
    "abnormal_minutes",
    "value_discrepancy",
    "avg_value_per_hour",
    "event_counts_per_hour",
    "counts_by_segment",
]


def typed_events(ev: DataFrame) -> DataFrame:
    """Q1: JSON-prop parse + typed projection."""
    typed = parse_json_column(ev, "props", "k INT")
    return typed.select(
        "event_id", "ts", "user_id", "event_type", "value", F.col("k").alias("prop_k")
    )


def abnormal_minutes(ev: DataFrame) -> DataFrame:
    """Q2: epoch-arithmetic derivation + disjunctive range filter + round."""
    return (
        ev.withColumn("__mins", minutes_since_midnight("ts"))
        .filter(outside_range(F.col("__mins"), 60, 1380))
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            pround(F.col("__mins"), 2).alias("minutes_since_midnight"),
        )
    )


def value_discrepancy(ev: DataFrame) -> DataFrame:
    """Q3: |observed - expected| > tol OR observed NULL (NULL-propagating)."""
    typed = parse_json_column(ev, "props", "k INT")
    flagged = discrepancy_filter(
        typed, observed="value", components=["k"], tolerance=50.0,
        out="amount_discrepancy",
    )
    return flagged.select(
        "event_id",
        "ts",
        "user_id",
        "value",
        pround(F.col("amount_discrepancy"), 2).alias("amount_discrepancy"),
    )


def avg_value_per_hour(ev: DataFrame, watermark: str | None = None) -> DataFrame:
    """Q4: hourly exact-cents averages + conditional (pivot-style) averages."""
    ev = not_null(ev, "value")
    is_p = F.col("event_type") == "purchase"
    is_c = F.col("event_type") == "click"
    return windowed_agg(
        ev,
        "ts",
        aggs={
            "avg_value": avg_money("value"),
            "purchase_avg": avg_money(F.when(is_p, F.col("value"))),
            "click_avg": avg_money(F.when(is_c, F.col("value"))),
        },
        watermark=watermark,
    )


def event_counts_per_hour(ev: DataFrame, watermark: str | None = None) -> DataFrame:
    """Q5: hourly count(*) + conditional counts."""
    return windowed_agg(
        ev,
        "ts",
        aggs={
            "total_events": F.count(F.lit(1)),
            "purchase_events": F.count(F.when(F.col("event_type") == "purchase", 1)),
            "click_events": F.count(F.when(F.col("event_type") == "click", 1)),
        },
        watermark=watermark,
    )


def counts_by_segment(
    ev: DataFrame, customer: DataFrame, watermark: str | None = None
) -> DataFrame:
    """Q6: prune -> broadcast left-join dimension -> two-key windowed count."""
    ev = prune(ev, "ts", "user_id")
    joined = dim_join(
        ev,
        customer,
        on=F.col("user_id") == F.col("c_custkey"),
        how="left",
        dim_cols=["c_custkey", "c_mktsegment"],
    )
    agg = windowed_agg(
        joined,
        "ts",
        aggs={"total_events": F.count("user_id")},
        extra_keys=["c_mktsegment"],
        watermark=watermark,
    )
    return agg.withColumnRenamed("c_mktsegment", "segment")
