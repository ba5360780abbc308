"""Python DataSource WRITER: the reference's append sink contract as a
native Spark 4 custom connector (batch + streaming, commit protocol).

The reference appends micro-batches to Postgres via foreachBatch
(`/root/reference/src/spark_streaming.py:116-124`); this engine's JDBC twin
lives in `streaming/sinks.py` (K1). THIS module re-expresses the SINK side
of the custom-connector surface the way round 2's `pyds.CsvReplaySource`
re-expressed the source side: a pure-Python `DataSource` with

- **executor-side writes**: each task streams its partition to a hidden
  ``.part-<uuid>.tmp`` CSV in the target directory and returns a commit
  message (file name + row count) — data never moves through the driver;
- **driver-side atomic commit**: ``commit()`` renames every temp to its
  final ``part-*.csv`` name and appends one line to a ``_manifest`` journal
  (readers that honor the manifest never observe a torn job); ``abort()``
  deletes the temps, so failed jobs leave no visible rows — the same
  all-or-nothing contract a JDBC transaction gives the reference;
- **epoch-idempotent streaming commits**: the stream writer records the
  micro-batch id in the journal and, when a RESTARTED query re-delivers a
  batch id already journaled, deletes the re-written temps instead of
  committing them — turning the engine's at-least-once batch replay into
  exactly-once visible output, the same dedup-by-epoch trick
  `streaming/sinks.py:ForeachBatchSink(idempotent=True)` plays for JDBC.

Use::

    spark.dataSource.register(CsvJournalSink)
    df.write.format("csv_journal").option("path", d).mode("append").save()
    df.writeStream.format("csv_journal").option("path", d) ...

Scale note: one file per task per batch, driver work bounded by one rename
+ journal line per task — no row ever serializes through the driver. The
journal grows one line per committed batch; compaction is a reader concern
(as with any log-structured manifest).
"""

from __future__ import annotations

import csv
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

__all__ = ["CsvJournalSink", "CsvJournalWriter", "CsvJournalStreamWriter"]


@dataclass
class _PartMessage(WriterCommitMessage):
    tmp_name: str
    n_rows: int


def _write_part(path: str, columns: list[str], iterator) -> _PartMessage:
    os.makedirs(path, exist_ok=True)
    tmp_name = f".part-{uuid.uuid4().hex}.tmp"
    n = 0
    with open(os.path.join(path, tmp_name), "w", newline="") as fh:
        w = csv.writer(fh)
        for row in iterator:
            w.writerow([row[c] for c in columns])
            n += 1
    return _PartMessage(tmp_name=tmp_name, n_rows=n)


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_manifest")


def _journaled_batches(path: str) -> set[int]:
    mf = _manifest_path(path)
    if not os.path.exists(mf):
        return set()
    out: set[int] = set()
    with open(mf) as fh:
        for line in fh:
            tag = line.split("\t", 1)[0]
            if tag.startswith("batch="):
                out.add(int(tag[len("batch="):]))
    return out


def _commit_parts(path: str, messages, tag: str) -> None:
    finals = []
    for m in messages:
        if m is None or m.n_rows == 0:
            # Dropped/empty task: nothing staged worth keeping.
            if m is not None:
                _discard_parts(path, [m])
            continue
        final = "part-" + m.tmp_name[len(".part-"):-len(".tmp")] + ".csv"
        os.rename(os.path.join(path, m.tmp_name), os.path.join(path, final))
        finals.append(f"{final}:{m.n_rows}")
    with open(_manifest_path(path), "a") as fh:
        fh.write(tag + "\t" + ",".join(finals) + "\n")


def _discard_parts(path: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        try:
            os.remove(os.path.join(path, m.tmp_name))
        except FileNotFoundError:
            pass


class CsvJournalWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]

    def write(self, iterator) -> _PartMessage:  # executor side
        return _write_part(self.path, self.columns, iterator)

    def commit(self, messages) -> None:  # driver side, all tasks succeeded
        _commit_parts(self.path, messages, f"job={uuid.uuid4().hex[:12]}")

    def abort(self, messages) -> None:  # driver side, some task failed
        _discard_parts(self.path, messages)


class CsvJournalStreamWriter(DataSourceStreamWriter):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]

    def write(self, iterator) -> _PartMessage:
        return _write_part(self.path, self.columns, iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        if batchId in _journaled_batches(self.path):
            # Replayed epoch after a restart: output is already visible —
            # discard the duplicate staging files, commit nothing.
            _discard_parts(self.path, messages)
            return
        _commit_parts(self.path, messages, f"batch={batchId}")

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _discard_parts(self.path, messages)


class CsvJournalSink(DataSource):
    """``format("csv_journal")`` — manifest-journaled CSV append sink."""

    @classmethod
    def name(cls) -> str:
        return "csv_journal"

    def writer(self, schema: StructType, overwrite: bool) -> CsvJournalWriter:
        if overwrite:
            raise NotImplementedError(
                "csv_journal is an append journal; overwrite semantics "
                "belong to a table format"
            )
        return CsvJournalWriter(schema, self.options)

    def streamWriter(  # noqa: N802 (Spark API name)
        self, schema: StructType, overwrite: bool
    ) -> CsvJournalStreamWriter:
        return CsvJournalStreamWriter(schema, self.options)
