"""Extended streaming-operator tests: dedup-within-watermark and
stream-stream interval joins — the Structured Streaming surfaces beyond the
reference's tumbling-window aggregations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.sources.files import read_stream
from stream_processing_pipeline_spark.streaming import MemoryRowsSink, run_available_now

from .test_streaming import EVENT_SCHEMA


def _write_chunks(spark, d, chunks):
    import time

    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, EVENT_SCHEMA).coalesce(1).write.parquet(
            str(d / f"chunk={i}")
        )
        time.sleep(1.1)
    return read_stream(spark, str(d / "chunk=*"), schema=EVENT_SCHEMA,
                       max_files_per_trigger=1)


def _row(i, minutes, etype="click", user=1):
    return Row(
        event_id=i,
        ts=dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minutes),
        user_id=user,
        event_type=etype,
        value=1.0,
        props="{}",
    )


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Exactly-once by event_id within the watermark horizon: a redelivered
    event (same id, later batch, inside the watermark) is dropped."""
    dup = _row(7, 5)
    stream = _write_chunks(
        spark,
        tmp_path / "dd",
        [[_row(1, 0), dup, _row(2, 10)], [dup, _row(3, 20)]],  # dup redelivered
    )
    deduped = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "60 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    sink = MemoryRowsSink()
    run_available_now(deduped, sink, checkpoint=str(tmp_path / "ckpt_dd"))
    ids = sorted(r.event_id for r in sink.rows)
    assert ids == [1, 2, 3, 7]  # exactly one copy of the duplicate


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchases joined to the same user's clicks within the prior 30
    minutes — watermarked stream-stream inner join with an event-time
    interval condition (state on both sides, bounded by the watermarks)."""
    rows = [
        _row(1, 0, "click"),
        _row(2, 10, "purchase"),   # joins click@0 (10 min before)
        _row(3, 100, "click"),
        _row(4, 170, "purchase"),  # click@100 is 70 min earlier -> no join
        _row(5, 200, "click"),
        _row(6, 220, "purchase"),  # joins click@200
    ]
    stream = _write_chunks(spark, tmp_path / "ssj", [rows[:3], rows[3:]])
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
    )
    sink = MemoryRowsSink()
    run_available_now(joined, sink, checkpoint=str(tmp_path / "ckpt_ssj"))
    pairs = sorted((r.purchase_id, r.click_id) for r in sink.rows)
    assert pairs == [(2, 1), (6, 5)]


def test_update_mode_windowed_counts(spark, tmp_path):
    """Update output mode: windows re-emit as new rows arrive (vs append's
    single finalized emission) — the mode for live dashboards. The last
    emission per window must equal the final count."""
    rows1 = [_row(1, 0), _row(2, 10)]
    rows2 = [_row(3, 20), _row(4, 70)]
    stream = _write_chunks(spark, tmp_path / "upd", [rows1, rows2])
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "60 minutes")
        .groupBy(F.window("ts", "60 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    sink = MemoryRowsSink()
    run_available_now(agg, sink, checkpoint=str(tmp_path / "ckpt_upd"),
                      output_mode="update")
    # Per epoch: the 00:00 window emits 2 (epoch 0) then 3 (epoch 1 update).
    emissions = [(e, r.start.minute + r.start.hour * 60, r.n)
                 for e, batch in sink.batches for r in batch]
    window0 = [(e, n) for e, m, n in emissions if m == 0]
    assert window0 == [(0, 2), (1, 3)]  # re-emission with the updated count
    assert (1, 1) in {(m // 60, n) for _, m, n in emissions}  # 01:00 window
