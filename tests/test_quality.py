"""Data-quality operators: checks must actually catch planted violations."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.operators.quality import (
    Check,
    fk_violations,
    run_checks,
)


def test_checks_catch_planted_violations(spark):
    df = spark.createDataFrame(
        [
            Row(qty=10.0, price=5.0, flag="A"),
            Row(qty=-1.0, price=5.0, flag="A"),     # qty violation
            Row(qty=10.0, price=-2.0, flag="N"),    # price violation
            Row(qty=10.0, price=5.0, flag="X"),     # domain violation
            Row(qty=None, price=5.0, flag="A"),     # NULL comparison -> not flagged by range
        ]
    )
    report = {
        r.check: (r.violations, r["pass"])
        for r in run_checks(
            df,
            [
                Check("qty_range", (F.col("qty") <= 0) | (F.col("qty") > 50)),
                Check("neg_price", F.col("price") < 0),
                Check("flag_domain", ~F.col("flag").isin("A", "N", "R")),
                Check("qty_null", F.col("qty").isNull()),
            ],
        ).collect()
    }
    assert report["qty_range"] == (1, False)
    assert report["neg_price"] == (1, False)
    assert report["flag_domain"] == (1, False)
    assert report["qty_null"] == (1, False)


def test_fk_violations_finds_orphans(spark):
    fact = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=99, v="orphan"), Row(k=None, v="n")]
    )
    dim = spark.createDataFrame([Row(d=1), Row(d=2)])
    orphans = fk_violations(fact, dim, "k", "d").collect()
    assert [r.v for r in orphans] == ["orphan"]  # NULL key excluded by contract
