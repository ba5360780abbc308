"""Python DataSource: the reference's resumable CSV cursor as a native
Spark 4 streaming source.

The reference replays a CSV into Kafka with a hand-rolled cursor file
(`/root/reference/src/kafka_stream.py` — read N rows, write `index` to a
JSON cursor, resume after restart). `CsvReplayer` (sources/kafka.py) keeps
wire-level parity with that tool; THIS module is the idiomatic Spark 4
re-expression: a custom `DataSource` whose **stream offsets are the
cursor**, so resume-after-restart is handled by the engine's checkpoint
mechanism instead of a side file — exactly-once bookkeeping for free, and
the source composes with every sink/trigger Spark has.

Registration and use::

    spark.dataSource.register(CsvReplaySource)
    df = (spark.readStream.format("csv_replay")
          .option("path", "events.csv")
          .option("ddl", "event_id bigint, ts string, value double")
          .option("rows_per_batch", "500")
          .load())

Scale note: the simple stream reader materializes batches on the driver —
right for a replay/ingest tool (the reference's is also single-process);
high-volume production ingest stays on the JVM Kafka source (sources/
kafka.py). This source's value is the resumable-cursor SEMANTICS surface.
"""

from __future__ import annotations

import csv

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

__all__ = ["CsvReplaySource", "CsvReplayStreamReader", "CsvReplayBatchReader"]


def _convert(value: str, dtype: str):
    if value == "":
        return None
    if dtype in ("bigint", "long", "int", "integer", "smallint", "tinyint"):
        return int(value)
    if dtype in ("double", "float"):
        return float(value)
    return value


class CsvReplayStreamReader(SimpleDataSourceStreamReader):
    """Offsets are ``{"index": <rows consumed>}`` — the reference's cursor
    file, persisted by Spark's checkpoint instead of by hand."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options["path"]
        self.rows_per_batch = int(options.get("rows_per_batch", "1000"))
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API names)
        return {"index": 0}

    def _rows(self, start: int, end: int | None) -> list[tuple]:
        out = []
        with open(self.path, newline="") as fh:
            reader = csv.DictReader(fh)
            for i, rec in enumerate(reader):
                if i < start:
                    continue
                if end is not None and i >= end:
                    break
                out.append(tuple(_convert(rec[n], t) for n, t in self.fields))
        return out

    def read(self, start: dict) -> tuple:
        first = start["index"]
        rows = self._rows(first, first + self.rows_per_batch)
        return iter(rows), {"index": first + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        # Deterministic replay for recovery: the same half-open row range
        # yields the same tuples (the file is append-only by contract).
        return iter(self._rows(start["index"], end["index"]))


class CsvReplayBatchReader(DataSourceReader):
    """Batch half of the connector: one backfill read of the same file with
    the same typed-conversion rules (``spark.read.format("csv_replay")``).
    ``skip_rows`` resumes a backfill from a known cursor — the batch twin of
    the stream's offset. Partitioning: a replay file is a single local CSV
    (the reference's shape), so one input partition is correct; cluster-
    scale CSV ingest belongs to Spark's native reader, not this connector."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options["path"]
        self.skip_rows = int(options.get("skip_rows", "0"))
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]

    def read(self, partition):
        with open(self.path, newline="") as fh:
            reader = csv.DictReader(fh)
            for i, rec in enumerate(reader):
                if i < self.skip_rows:
                    continue
                yield tuple(_convert(rec[n], t) for n, t in self.fields)


class CsvReplaySource(DataSource):
    """``format("csv_replay")`` — options: path, ddl, rows_per_batch
    (stream), skip_rows (batch)."""

    @classmethod
    def name(cls) -> str:
        return "csv_replay"

    def schema(self) -> str:
        # Return the DDL string as-is: this may run inside a Python worker
        # with no SparkContext, so no engine-side parsing here (Spark parses
        # it and hands the reader a StructType).
        return self.options["ddl"]

    def reader(self, schema: StructType) -> CsvReplayBatchReader:
        return CsvReplayBatchReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> CsvReplayStreamReader:  # noqa: N802
        return CsvReplayStreamReader(schema, self.options)
