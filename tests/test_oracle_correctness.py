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
