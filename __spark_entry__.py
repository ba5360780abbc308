"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Q6: broadcast dim join + two-key
event-time windowed aggregation) on sf0.001. ``queries()`` /``oracle_sql()``
expose the full registered query set of
:mod:`stream_processing_pipeline_spark.plans` — one entry per implemented
operator family from SURVEY.md §2 plus the beyond-parity extension suites.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stream_processing_pipeline_spark.plans import all_oracles, all_queries  # noqa: E402

_SF_SMALL = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["q6_counts_by_segment"](spark, _SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
