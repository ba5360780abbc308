"""Event-time tumbling windows and window-struct flattening.

The reference groups on ``window(pickup_datetime, "60 minutes")`` and then
flattens the window struct into ``date`` / ``start_time`` / ``end_time``
columns before sinking (``/root/reference/src/spark_streaming.py:246,252-259,
281-288,321-327``). These helpers reproduce that exactly: ``date`` is the
window-start date, times are ``HH:mm:ss`` strings.

Spark aligns tumbling windows to the epoch, so a 60-minute window is identical
to ``date_trunc('hour', ts)`` — which is how the DuckDB oracles express it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["tumbling_window", "flatten_window"]


def tumbling_window(ts_col: Column | str, duration: str = "60 minutes") -> Column:
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.window(c, duration)


def flatten_window(df: DataFrame, window_col: str = "window") -> DataFrame:
    """Replace the window struct with date / start_time / end_time columns.

    Matches the reference's sink shape (FIXTURES.md §A3): ``date`` DATE,
    ``start_time``/``end_time`` 'HH:mm:ss' strings. The flattened columns are
    prepended; remaining columns keep their order.
    """
    w = F.col(window_col)
    rest = [c for c in df.columns if c != window_col]
    return df.select(
        w.start.cast("date").alias("date"),
        F.date_format(w.start, "HH:mm:ss").alias("start_time"),
        F.date_format(w.end, "HH:mm:ss").alias("end_time"),
        *rest,
    )
