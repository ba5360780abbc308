"""Python DataSource writer (sources/pyds_sink.py): commit protocol,
abort invisibility, and exactly-once streaming re-commit."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from stream_processing_pipeline_spark.sources.pyds_sink import (
    CsvJournalSink,
    CsvJournalStreamWriter,
    CsvJournalWriter,
    _PartMessage,
)


def _register(spark):
    try:
        spark.dataSource.register(CsvJournalSink)
    except Exception:
        pass  # already registered in this session


def _visible_rows(d: str) -> list[list[str]]:
    import csv

    rows = []
    for name in sorted(os.listdir(d)):
        if name.startswith("part-") and name.endswith(".csv"):
            with open(os.path.join(d, name)) as fh:
                rows.extend(list(csv.reader(fh)))
    return rows


def test_batch_write_roundtrip(spark, tmp_path):
    _register(spark)
    d = str(tmp_path / "out")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("dbl"), F.lit("x").alias("tag")
    )
    df.write.format("csv_journal").option("path", d).mode("append").save()
    rows = _visible_rows(d)
    assert sorted(int(r[0]) for r in rows) == list(range(100))
    assert all(int(r[1]) == 2 * int(r[0]) and r[2] == "x" for r in rows)
    # exactly one job line in the journal; no leftover temp files
    with open(os.path.join(d, "_manifest")) as fh:
        lines = fh.read().splitlines()
    assert len(lines) == 1 and lines[0].startswith("job=")
    assert not [n for n in os.listdir(d) if n.endswith(".tmp")]


def test_batch_append_accumulates(spark, tmp_path):
    _register(spark)
    d = str(tmp_path / "out")
    for _ in range(2):
        spark.range(10).write.format("csv_journal").option("path", d).mode(
            "append"
        ).save()
    assert len(_visible_rows(d)) == 20


def test_abort_leaves_no_visible_rows(tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    d = str(tmp_path / "out")
    schema = StructType([StructField("id", LongType())])
    w = CsvJournalWriter(schema, {"path": d})
    msgs = [w.write(iter([{"id": 1}, {"id": 2}])), w.write(iter([{"id": 3}]))]
    assert len(os.listdir(d)) == 2  # temps staged but hidden
    w.abort(msgs)
    assert _visible_rows(d) == []
    assert not os.path.exists(os.path.join(d, "_manifest"))


def test_stream_recommit_is_idempotent(tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    d = str(tmp_path / "out")
    schema = StructType([StructField("id", LongType())])
    w = CsvJournalStreamWriter(schema, {"path": d})
    w.commit([w.write(iter([{"id": 1}, {"id": 2}]))], batchId=0)
    assert len(_visible_rows(d)) == 2
    # engine replays batch 0 after a restart: same data re-staged
    w.commit([w.write(iter([{"id": 1}, {"id": 2}]))], batchId=0)
    assert len(_visible_rows(d)) == 2  # still exactly once
    w.commit([w.write(iter([{"id": 3}]))], batchId=1)
    assert sorted(int(r[0]) for r in _visible_rows(d)) == [1, 2, 3]


def test_streaming_end_to_end(spark, tmp_path):
    _register(spark)
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ckpt")
    for i in range(2):
        spark.createDataFrame(
            [(i * 10 + j,) for j in range(10)], "id long"
        ).coalesce(1).write.parquet(str(src / f"chunk={i}"))
        time.sleep(1.1)
    from pyspark.sql.types import LongType, StructField, StructType

    stream = spark.readStream.schema(
        StructType([StructField("id", LongType())])
    ).option("maxFilesPerTrigger", "1").parquet(str(src / "chunk=*"))
    q = (
        stream.writeStream.format("csv_journal")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(int(r[0]) for r in _visible_rows(out)) == list(range(20))
    batches = {
        line.split("\t")[0]
        for line in open(os.path.join(out, "_manifest")).read().splitlines()
    }
    assert batches == {"batch=0", "batch=1"}
    # restart with the same checkpoint: nothing new to process, no dupes
    q2 = (
        stream.writeStream.format("csv_journal")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(int(r[0]) for r in _visible_rows(out)) == list(range(20))
