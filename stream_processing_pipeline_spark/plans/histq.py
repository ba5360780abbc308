"""Mergeable-histogram queries: sort-free distribution analytics.

The scale problem these demonstrate: percentiles over 100 TB. Exact
percentile functions sort (or multi-pass select) within each group; a
mergeable sketch summarizes once and re-aggregates forever. The fixed-width
cent histogram (:mod:`..operators.histogram`) is the exactly-verifiable
version — deterministic per row, associative under merge, quantile readout
by a fixed portable rule — so unlike t-digest/KLL the whole pipeline
value-hash-verifies against DuckDB.

``hist_value_rollup`` pins the merge path itself (daily histograms merged
across days must equal the histogram built directly); ``hist_value_
quantiles`` pins the readout. Both touch only ``groups x bins`` rows after
the one aggregation pass over events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.histogram import (
    DEFAULT_WIDTH_CENTS,
    hist_bin_sql,
    histogram_quantiles,
    merge_histograms,
    value_histogram,
)
from .common import catalog
from .registry import register

_W = DEFAULT_WIDTH_CENTS
_BIN = hist_bin_sql("value", _W)


@register(
    "hist_value_rollup",
    oracle=f"""
    SELECT event_type, {_BIN} AS bin, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type, bin
    """,
    tags=("batch", "histogram", "sketch", "reaggregatable"),
)
def hist_value_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build per-(day, type) histograms, then MERGE across days to per-type
    — the oracle builds per-type directly from raw events, so a green row
    proves the merge is lossless (the sketch property that lets daily
    rollups serve any later aggregation window without rescanning)."""
    ev = catalog(spark, sf_dir).events.withColumn("day", F.to_date("ts"))
    daily = value_histogram(ev, "value", ["day", "event_type"], _W)
    return merge_histograms(daily, ["event_type"])


@register(
    "hist_value_quantiles",
    oracle=f"""
    WITH h AS (
      SELECT event_type, {_BIN} AS bin, count(*) AS n
      FROM events GROUP BY event_type, bin
    ),
    c AS (
      SELECT event_type, bin,
             sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS total
      FROM h
    )
    SELECT event_type,
           CAST(max(total) AS BIGINT) AS total_n,
           min(CASE WHEN cum >= (total * 50 + 99) // 100
                    THEN ((bin + 1) * {_W} - 1) / 100.0 END) AS p50,
           min(CASE WHEN cum >= (total * 90 + 99) // 100
                    THEN ((bin + 1) * {_W} - 1) / 100.0 END) AS p90,
           min(CASE WHEN cum >= (total * 99 + 99) // 100
                    THEN ((bin + 1) * {_W} - 1) / 100.0 END) AS p99
    FROM c GROUP BY event_type
    """,
    tags=("batch", "histogram", "quantiles", "sketch"),
)
def hist_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per type, read off the merged histogram
    with the fixed upper-edge rule — bin-width-bounded error, zero rescans
    of the data the histogram summarizes."""
    ev = catalog(spark, sf_dir).events.withColumn("day", F.to_date("ts"))
    daily = value_histogram(ev, "value", ["day", "event_type"], _W)
    merged = merge_histograms(daily, ["event_type"])
    return histogram_quantiles(merged, ["event_type"], (50, 90, 99), _W)
