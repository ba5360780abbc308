"""transformWithStateInPandas: construction always, execution where possible.

The Spark 4 stateful-processor wire protocol needs ``google.protobuf`` in
the Python environment (see streaming/stateful.py docstring). This container
lacks it, so the execution test self-skips — the same honest gating as the
Kafka/SMTP live paths. Construction (processor init contract, builder plan
shape) is pinned unconditionally so API drift still fails fast here.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.streaming.stateful import (
    HAS_TWS_RUNTIME,
    RunningStatsProcessor,
    user_stats_transform_with_state,
)


def test_processor_constructs_and_aggregates_locally():
    """The processor's row-handling logic, driven directly (no stream)."""
    import pandas as pd

    proc = RunningStatsProcessor()

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def getValueState(self, name, schema, ttl_duration_ms=None):
            assert name == "agg"
            assert "BIGINT" in schema
            return FakeValueState()

    proc.init(FakeHandle())
    batch = pd.DataFrame({"c": [100, 250, 50]})
    out = list(proc.handleInputRows((7,), iter([batch]), None))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["user_id"], row["n_events"], row["total_cents"]) == (7, 3, 400)
    # second batch accumulates into the same state
    out2 = list(proc.handleInputRows((7,), iter([pd.DataFrame({"c": [10]})]), None))
    row2 = out2[0].iloc[0]
    assert (row2["n_events"], row2["total_cents"]) == (4, 410)
    proc.close()


def test_builder_produces_tws_plan(spark):
    """groupBy().transformWithStateInPandas appears in the analyzed plan."""
    narrow = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "user_id long, c long"
    )
    out = user_stats_transform_with_state(narrow)
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "total_cents",
    ]
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "TransformWithState" in plan


@pytest.mark.skipif(
    not HAS_TWS_RUNTIME,
    reason="google.protobuf absent: transformWithState state server cannot run",
)
def test_tws_stream_equals_batch(spark, tmp_path):
    """One-file availableNow TWS run == batch groupBy (runs where protobuf exists)."""
    from stream_processing_pipeline_spark.streaming.runner import ROCKSDB_PROVIDER

    sf_dir = "/root/testdata/sf0.001"
    raw_schema = spark.read.parquet(sf_dir + "/events.parquet").schema
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        narrow = stream.select(
            "user_id", F.expr("CAST(round(value*100) AS LONG)").alias("c")
        )
        stats = user_stats_transform_with_state(narrow)
        q = (
            stats.writeStream.format("memory")
            .queryName("tws_equiv")
            .outputMode("append")
            .option(
                "checkpointLocation", tempfile.mkdtemp(dir=tmp_path, prefix="tws_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        got = {
            r["user_id"]: (r["n_events"], r["total_cents"])
            for r in spark.table("tws_equiv").collect()
        }
        want = {
            r["user_id"]: (r["n"], r["c"])
            for r in spark.read.parquet(sf_dir + "/events.parquet")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.expr("CAST(round(value*100) AS LONG)")).alias("c"),
            )
            .collect()
        }
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
