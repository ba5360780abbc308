"""Windowed conditional aggregations (reference A1-A3).

The reference's three streaming aggregations share one shape: watermark ->
event-time tumbling window (optionally + a second key) -> aggregate with
conditional variants per category (``avg(CASE WHEN payment_type=1 THEN
total_amount END)`` — a manual pivot,
``/root/reference/src/spark_streaming.py:242-298,314-320``) -> flatten the
window struct. :func:`windowed_agg` factors that into one operator usable in
both batch (window = ``date_trunc`` grouping) and streaming (with watermark)
mode.

Scale: Spark executes these as partial (map-side) + final hash aggregation, so
the shuffle carries one row per (window, keys) per input partition — the
conditional-aggregation idiom keeps it to a single shuffle regardless of how
many categories are pivoted (vs one shuffle per category with separate
filtered aggs). In streaming mode state is keyed by (window, keys); the
watermark bounds state size by evicting finalized windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.windows import flatten_window, tumbling_window

__all__ = ["conditional", "windowed_agg"]


def conditional(agg_fn, when_cond: Column, value: Column | str) -> Column:
    """``agg(CASE WHEN cond THEN value END)`` — the conditional-agg idiom.

    Note ``count(CASE ...)`` counts non-NULLs, distinct from ``count(*)``
    (reference A2 semantics)."""
    v = F.col(value) if isinstance(value, str) else value
    return agg_fn(F.when(when_cond, v))


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, Column],
    duration: str = "60 minutes",
    extra_keys: list[str] | None = None,
    watermark: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """Tumbling-window aggregation with optional extra grouping keys.

    With ``watermark`` set (streaming), late rows beyond the delay are
    dropped and windows finalize in append mode (reference W1-W3). In batch
    mode the same grouping runs as an ordinary hash aggregation.
    """
    if watermark:
        # Watermarks require TIMESTAMP (LTZ); under the UTC session the cast
        # from TIMESTAMP_NTZ is a wall-clock identity.
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    keys = [tumbling_window(ts_col, duration).alias("window")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    out = df.groupBy(*keys).agg(*[expr.alias(name) for name, expr in aggs.items()])
    return flatten_window(out) if flatten else out
