"""CsvReplayer cursor parity (reference S2) + streaming content dedup."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.operators.text import fingerprint
from stream_processing_pipeline_spark.sources.files import read_stream
from stream_processing_pipeline_spark.sources.kafka import CsvReplayer
from stream_processing_pipeline_spark.streaming import MemoryRowsSink, run_available_now


def _replayer(tmp_path) -> CsvReplayer:
    return CsvReplayer(
        topic="t",
        csv_path=str(tmp_path / "in.csv"),
        cursor_path=str(tmp_path / "cursor.txt"),
    )


def test_cursor_roundtrip(tmp_path):
    r = _replayer(tmp_path)
    assert r._read_cursor() == 0  # missing file -> start at 0
    r._write_cursor(2500)
    assert r._read_cursor() == 2500


def test_cursor_corrupt_file_resets(tmp_path):
    r = _replayer(tmp_path)
    (tmp_path / "cursor.txt").write_text("not-a-number")
    assert r._read_cursor() == 0  # reference behavior: unreadable -> replay


def test_replayer_requires_kafka(tmp_path):
    """Without kafka-python the tool fails with a clear message instead of
    an ImportError at some inner call site."""
    import pytest

    (tmp_path / "in.csv").write_text("a,b\n1,2\n")
    r = _replayer(tmp_path)
    try:
        import kafka  # noqa: F401

        pytest.skip("kafka-python installed; live path not under test here")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="kafka-python is not installed"):
        r.run()


class _FakeProducer:
    """In-memory producer: records sends, optionally fails the Nth flush."""

    def __init__(self, fail_on_flush: int | None = None):
        self.sent: list = []
        self.flushes = 0
        self.fail_on_flush = fail_on_flush
        self.closed = False

    def send(self, topic, row):
        self.sent.append((topic, row))

    def flush(self):
        self.flushes += 1
        if self.fail_on_flush is not None and self.flushes >= self.fail_on_flush:
            raise RuntimeError("broker gone")

    def close(self):
        self.closed = True


def _csv_rows(tmp_path, n: int) -> None:
    lines = ["a,b"] + [f"{i},{i * 2}" for i in range(n)]
    (tmp_path / "in.csv").write_text("\n".join(lines) + "\n")


def test_cursor_advances_only_after_flush(tmp_path, monkeypatch):
    """A flush failure must leave the cursor at the last *flushed* row, not
    at the last row handed to the async send — otherwise restart skips
    unacknowledged rows and the at-least-once contract silently becomes
    at-most-once (VERDICT round-1 finding)."""
    _csv_rows(tmp_path, 10)
    r = _replayer(tmp_path)
    r.flush_every = 4
    fake = _FakeProducer(fail_on_flush=2)  # first flush (row 4) ok, second dies
    monkeypatch.setattr(r, "_create_producer", lambda: fake)
    try:
        r.run()
    except RuntimeError:
        pass
    assert r._read_cursor() == 4  # only the flushed prefix is acknowledged
    assert fake.closed

    # Restart with a healthy producer: resumes at row 4, re-sends the tail.
    fake2 = _FakeProducer()
    monkeypatch.setattr(r, "_create_producer", lambda: fake2)
    sent = r.run()
    assert sent == 6
    assert [row["a"] for _, row in fake2.sent] == [str(i) for i in range(4, 10)]
    assert r._read_cursor() == 10


def test_clean_run_persists_full_cursor(tmp_path, monkeypatch):
    _csv_rows(tmp_path, 7)
    r = _replayer(tmp_path)
    r.flush_every = 3
    fake = _FakeProducer()
    monkeypatch.setattr(r, "_create_producer", lambda: fake)
    assert r.run() == 7
    assert r._read_cursor() == 7
    assert fake.flushes >= 3  # two periodic + one final


def test_streaming_content_dedup(spark, tmp_path):
    """Streaming dedup bridge: a document stream deduplicated by content
    fingerprint with dropDuplicatesWithinWatermark — re-crawled duplicates
    (same text, later arrival, different doc_id) are dropped exactly-once.
    This is the streaming form of dedup_exact: same normalize+h60 key."""
    import time

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("crawl_ts", TimestampNTZType()),
            StructField("text", StringType()),
        ]
    )
    base = dt.datetime(2024, 1, 1)

    def doc(i, minutes, text):
        return Row(doc_id=i, crawl_ts=base + dt.timedelta(minutes=minutes), text=text)

    chunks = [
        [doc(1, 0, "alpha beta gamma"), doc(2, 1, "delta epsilon zeta")],
        # doc 3 is a re-crawl of doc 1's content (punctuation differs ->
        # same normalized fingerprint); doc 4 is new.
        [doc(3, 2, "Alpha,  beta GAMMA!"), doc(4, 3, "eta theta iota")],
    ]
    d = tmp_path / "docs"
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(d / f"chunk={i}")
        )
        time.sleep(1.1)
    stream = read_stream(spark, str(d / "chunk=*"), schema=schema,
                         max_files_per_trigger=1)
    deduped = (
        stream.withColumn("fp", fingerprint("text"))
        .withColumn("crawl_ts", F.col("crawl_ts").cast("timestamp"))
        .withWatermark("crawl_ts", "60 minutes")
        .dropDuplicatesWithinWatermark(["fp"])
    )
    sink = MemoryRowsSink()
    run_available_now(deduped, sink, checkpoint=str(tmp_path / "ckpt"))
    kept = sorted(r.doc_id for r in sink.rows)
    assert kept == [1, 2, 4]  # the re-crawl (doc 3) was dropped


def test_python_datasource_resumable_cursor(spark, tmp_path):
    """The Spark 4 Python DataSource re-expression of the reference's CSV
    cursor (kafka_stream.py): offsets ARE the cursor, so a restart against
    the same checkpoint resumes where the last run stopped — no duplicates,
    no side files — and newly appended rows are picked up."""
    import csv as csvmod

    from stream_processing_pipeline_spark.sources.pyds import CsvReplaySource
    from stream_processing_pipeline_spark.streaming import MemoryRowsSink, run_available_now

    path = tmp_path / "events.csv"
    with open(path, "w", newline="") as fh:
        w = csvmod.writer(fh)
        w.writerow(["event_id", "value"])
        for i in range(10):
            w.writerow([i, i * 1.5])

    spark.dataSource.register(CsvReplaySource)

    def read_stream():
        return (
            spark.readStream.format("csv_replay")
            .option("path", str(path))
            .option("ddl", "event_id bigint, value double")
            .option("rows_per_batch", "4")
            .load()
        )

    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sink = MemoryRowsSink()
        run_available_now(read_stream(), sink, ckpt)
        return sorted(r.event_id for r in sink.rows)

    # The simple stream reader prefetches one chunk per availableNow run, so
    # each restart consumes exactly rows_per_batch from the persisted cursor
    # — three runs walk the whole file with no duplicates and no side files.
    assert run_once() == [0, 1, 2, 3]
    assert run_once() == [4, 5, 6, 7]
    assert run_once() == [8, 9]

    # cursor at EOF: a restart with nothing new emits nothing
    assert run_once() == []

    # append rows; the next restart picks up only the appended tail
    with open(path, "a", newline="") as fh:
        w = csvmod.writer(fh)
        for i in range(10, 13):
            w.writerow([i, i * 1.5])
    assert run_once() == [10, 11, 12]


def test_python_datasource_batch_backfill(spark, tmp_path):
    """The batch half of the csv_replay connector: spark.read over the same
    file and type rules, with skip_rows resuming a backfill from a known
    cursor (the batch twin of the stream's offset)."""
    import csv as csvmod

    from stream_processing_pipeline_spark.sources.pyds import CsvReplaySource

    path = tmp_path / "batch.csv"
    with open(path, "w", newline="") as fh:
        w = csvmod.writer(fh)
        w.writerow(["event_id", "value"])
        for i in range(8):
            w.writerow([i, i * 1.5])
        w.writerow([8, ""])  # empty string -> NULL, same rule as the stream

    spark.dataSource.register(CsvReplaySource)

    def read(skip=0):
        return (
            spark.read.format("csv_replay")
            .option("path", str(path))
            .option("ddl", "event_id bigint, value double")
            .option("skip_rows", str(skip))
            .load()
        )

    full = {r.event_id: r.value for r in read().collect()}
    assert len(full) == 9 and full[3] == 4.5 and full[8] is None

    resumed = sorted(r.event_id for r in read(skip=6).collect())
    assert resumed == [6, 7, 8]
