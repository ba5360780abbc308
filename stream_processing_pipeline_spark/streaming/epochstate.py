"""Epoch-partitioned streaming state tables with periodic snapshots.

A ``foreachBatch`` pipeline that carries state across micro-batches (the
corpus ingest's seen-hash table and MinHash band index) needs two
properties at once:

1. **Replay idempotence** — Structured Streaming re-runs a batch under the
   SAME epoch id after a crash, so every write must land in a partition
   owned by that epoch and be rewritten identically on replay (plain
   appends duplicate rows; see ``corpus_ingest_batch``'s crash-window
   notes).
2. **Bounded read cost** — with one delta partition per micro-batch, batch
   N's "state so far" read is a union of N-1 directories: a small-files /
   partition-listing amplifier that grows with STREAM AGE, not data volume
   (review finding r8). At thousands of micro-batches the listing alone
   dominates.

:class:`EpochTable` gives both. Layout under one root::

    {root}/kind=delta/epoch={N}/   rows first written by micro-batch N
    {root}/kind=snap/upto={T}/     compaction: all rows of epochs < T

Batch N reads state via :meth:`read_before`: the best snapshot with
``upto <= N`` plus the deltas in ``[upto, N)`` — at most
``snapshot_every`` directories regardless of N (pinned by
``tests/test_streaming_extended.py``). Snapshots are written by
:meth:`maybe_snapshot` at the END of every ``snapshot_every``-th batch and
cover *everything up to and including that batch's own delta*, so their
content is a pure function of committed inputs:

- a replay of batch N rewrites its own delta, then re-derives the same
  snapshot bytes from the same ``read_before(N)`` + delta inputs;
- a replay never READS its own torn writes: ``read_before(N)`` excludes
  delta ``epoch=N`` (half-written by the crashed attempt) and snapshot
  ``upto=N+1`` (ditto), and every other snapshot ``upto <= N`` was
  finished by an earlier batch that Structured Streaming fully committed
  before starting N.

Snapshots make the parquet READ bounded; :meth:`prune_covered` closes the
rest (review finding r9): a delta partition strictly below the newest
committed snapshot's coverage, or a snapshot superseded by a newer
committed one, can never be read by any future batch or replay again, so
the ingest removes them each batch. With pruning on, disk footprint and
the per-batch ``os.listdir`` are both O(``snapshot_every``) directories —
bounded by the compaction cadence, never by stream age.

Directory enumeration uses ``os.listdir`` — the right call for this
repo's local-filesystem contract. On a real cluster the two listing
helpers below are the single swap point for the Hadoop FileSystem API
(``jvm.org.apache.hadoop.fs.FileSystem``); nothing else touches paths.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_PART_RE = re.compile(r"^(epoch|upto)=(\d+)$")


def _list_tags(root: str, kind: str) -> list[int]:
    """Sorted partition tags under ``{root}/kind={kind}``, [] if absent."""
    base = os.path.join(root, f"kind={kind}")
    if not os.path.isdir(base):
        return []
    tags = []
    for name in os.listdir(base):
        m = _PART_RE.match(name)
        if m and os.path.isdir(os.path.join(base, name)):
            tags.append(int(m.group(2)))
    return sorted(tags)


class EpochTable:
    """One epoch-partitioned state table (see module docstring)."""

    def __init__(self, root: str, snapshot_every: int = 8) -> None:
        if snapshot_every < 1:
            raise ValueError("snapshot_every must be >= 1")
        self.root = root
        self.snapshot_every = snapshot_every

    # ------------------------------------------------------------ paths
    def _delta_path(self, epoch_id: int) -> str:
        return os.path.join(self.root, "kind=delta", f"epoch={int(epoch_id)}")

    def _snap_path(self, upto: int) -> str:
        return os.path.join(self.root, "kind=snap", f"upto={int(upto)}")

    def paths_before(self, epoch_id: int) -> list[str]:
        """The directories batch ``epoch_id`` reads for "state so far":
        the best committed snapshot (``upto <= epoch_id``) plus the delta
        partitions in ``[upto, epoch_id)``. Never the batch's own
        partitions — a replay must not see its previous attempt's torn
        writes. Length is bounded by ``snapshot_every`` once snapshots
        run, independent of epoch_id."""
        snaps = [t for t in _list_tags(self.root, "snap") if t <= epoch_id]
        base = max(snaps) if snaps else 0
        paths = [self._snap_path(base)] if base else []
        for e in _list_tags(self.root, "delta"):
            if base <= e < epoch_id:
                paths.append(self._delta_path(e))
        return paths

    def paths_all(self) -> list[str]:
        """Every committed row exactly once: the latest snapshot plus the
        deltas at or past its coverage (for end-of-stream summaries)."""
        snaps = _list_tags(self.root, "snap")
        base = max(snaps) if snaps else 0
        paths = [self._snap_path(base)] if base else []
        for e in _list_tags(self.root, "delta"):
            if e >= base:
                paths.append(self._delta_path(e))
        return paths

    # ------------------------------------------------------------ reads
    def read_before(self, spark: SparkSession, epoch_id: int) -> DataFrame | None:
        """State visible to batch ``epoch_id``, or None when empty."""
        paths = self.paths_before(epoch_id)
        return spark.read.parquet(*paths) if paths else None

    def read_all(self, spark: SparkSession) -> DataFrame | None:
        paths = self.paths_all()
        return spark.read.parquet(*paths) if paths else None

    def read_delta(self, spark: SparkSession, epoch_id: int) -> DataFrame:
        """Exactly the rows first written by micro-batch ``epoch_id``
        (audit/summary use — production reads go through read_before)."""
        return spark.read.parquet(self._delta_path(epoch_id))

    # ----------------------------------------------------------- writes
    def write_delta(self, df: DataFrame, epoch_id: int) -> None:
        """Land batch ``epoch_id``'s rows in its own partition; replay
        overwrites the same directory with the same content."""
        df.write.mode("overwrite").parquet(self._delta_path(epoch_id))

    def maybe_snapshot(self, spark: SparkSession, epoch_id: int) -> bool:
        """At the end of every ``snapshot_every``-th batch, rewrite all
        state through this batch into one snapshot partition
        ``upto=epoch_id+1``. Inputs are exactly ``read_before(epoch_id)``
        plus this batch's (already committed) delta, so a replay
        reproduces the snapshot bit-for-bit at row grain. Returns whether
        a snapshot was written."""
        if (int(epoch_id) + 1) % self.snapshot_every != 0:
            return False
        parts = self.paths_before(epoch_id) + [self._delta_path(epoch_id)]
        snap = spark.read.parquet(*parts)
        snap.write.mode("overwrite").parquet(self._snap_path(int(epoch_id) + 1))
        return True

    # ---------------------------------------------------------- pruning
    def prune_covered(self, epoch_id: int) -> int:
        """Remove state no future read or replay can reach, from INSIDE
        batch ``epoch_id``'s ``foreachBatch`` (where every batch <
        ``epoch_id`` is known committed, so the newest snapshot with
        ``upto <= epoch_id`` — written by a committed earlier batch — is
        complete, never torn). Let S be that snapshot's tag: every future
        ``read_before(M >= epoch_id)`` resolves its base to >= S and reads
        deltas >= S only, and Structured Streaming can only replay batches
        >= ``epoch_id``. Deltas with ``epoch < S`` and snapshots with
        ``upto < S`` are therefore unreachable — delete them so disk AND
        per-batch listing stay bounded by the snapshot cadence, not stream
        age. Idempotent (a replay re-deletes nothing). Returns the number
        of directories removed."""
        import shutil

        snaps = [t for t in _list_tags(self.root, "snap") if t <= epoch_id]
        if not snaps:
            return 0
        base = max(snaps)
        removed = 0
        for t in snaps:
            if t < base:
                shutil.rmtree(self._snap_path(t), ignore_errors=True)
                removed += 1
        for e in _list_tags(self.root, "delta"):
            if e < base:
                shutil.rmtree(self._delta_path(e), ignore_errors=True)
                removed += 1
        return removed
