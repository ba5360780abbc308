"""Every registered query must match its DuckDB oracle at sf0.01 —
the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from stream_processing_pipeline_spark.plans import REGISTRY

from .conftest import SF_MED
from .oracle_harness import check_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    problems = check_query(spark, name, SF_MED)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_returns_rows(spark, name):
    df = REGISTRY[name].fn(spark, SF_MED)
    assert df.count() >= 0


def test_mirror_catches_decimal_vs_int64(spark):
    """Regression for the r2 `mm_format_stats` driver hash-FAIL.

    DuckDB returns `sum(BIGINT)` as DECIMAL(38,0); the driver's value-hash is
    type-sensitive, so an oracle `sum(x)` against a Spark `F.sum` (int64)
    fails the gate even when every value matches. The pandas path masked this
    (`.df()` coerces DECIMAL(38,0) → float64); the arrow-level check must not.
    """
    import duckdb

    from .oracle_harness import compare_arrow_types

    uncast = duckdb.sql("SELECT sum(x) AS total FROM (VALUES (1), (2)) t(x)")
    spark_schema = spark.createDataFrame([(3,)], "total long").schema

    problems = compare_arrow_types(spark_schema, uncast.fetch_arrow_table().schema)
    assert problems and "decimal" in problems[0], problems

    cast = duckdb.sql(
        "SELECT CAST(sum(x) AS BIGINT) AS total FROM (VALUES (1), (2)) t(x)"
    )
    assert not compare_arrow_types(spark_schema, cast.fetch_arrow_table().schema)
