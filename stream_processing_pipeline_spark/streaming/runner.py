"""Named-query topology management.

The reference starts six queries and serially ``awaitTermination``s each
(``/root/reference/src/spark_streaming.py:340-360``); the engine manages
them as a named collection with per-query checkpoints (reference W5/W6
semantics) and ``spark.streams.awaitAnyTermination`` so one failure
surfaces immediately instead of being masked behind an earlier await.

``run_available_now`` is the one-shot runner: process everything currently
available and stop (Spark's ``trigger(availableNow=True)``) — the mechanism
behind the stream/batch equivalence tests and operational backfills.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .sinks import ForeachBatchSink

__all__ = ["StreamQuerySpec", "Topology", "run_available_now", "ROCKSDB_PROVIDER"]

# Spark's bundled RocksDB state store: spills streaming-aggregation state to
# local disk instead of keeping it on the JVM heap. At 100 TB-scale state
# (high-cardinality keys x long watermarks) the default HDFS-backed in-memory
# provider OOMs executors; RocksDB bounds memory and survives far larger
# per-partition state. Changelog checkpointing keeps recovery incremental.
# Measured (r11+r12, SCALING.md "Streaming state at high key cardinality",
# tools/r11_state_scale_probe.py): the HDFS provider's heap bytes grow
# linearly with state rows (~270 B/row at 300k; at 3M rows it holds
# 1.54 GB on-heap vs RocksDB's 72 MB — a measured 21x divergence), and
# at 3M rows the trades are no longer flat: hdfs is ~25% faster on
# steady-state wall WHILE state fits the heap, RocksDB bounds memory at
# a throughput cost, and changelog mode's recovery pays changelog replay
# on top of the last snapshot (4.18 s vs 1.18 s plain at 3M rows) in
# exchange for cheaper per-batch checkpoints — pick changelog for
# checkpoint-bound pipelines with rare restarts, plain snapshots for
# restart-latency-sensitive ones.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@dataclass
class StreamQuerySpec:
    """One named streaming query: transformed DF + sink + mode."""

    name: str
    df: DataFrame
    sink: ForeachBatchSink | Callable[[DataFrame, int], None]
    output_mode: str = "append"
    trigger: dict | None = None  # e.g. {"processingTime": "10 seconds"}


@dataclass
class Topology:
    """A set of streaming queries sharing a checkpoint root.

    Each query gets ``<checkpoint_root>/<name>`` (reference W5: one
    checkpoint dir per query, ``spark_streaming.py:135,190,...``).
    """

    spark: SparkSession
    checkpoint_root: str
    specs: list[StreamQuerySpec] = field(default_factory=list)
    # "rocksdb", "hdfs" (the default provider), or a provider class name.
    # Applied to the session at start_all — the provider is read when a
    # query starts and is pinned into its checkpoint thereafter.
    state_store: str | None = None
    # RocksDB changelog checkpointing: instead of uploading a full state
    # snapshot per checkpoint, upload the per-batch CHANGELOG and snapshot
    # in the background — the knob that amortizes checkpoint upload cost
    # when state is large (the 100 TB question; recovery replays changelog
    # onto the last snapshot). None leaves Spark's default (off). Only
    # meaningful with state_store="rocksdb". Through r4 this was
    # hard-wired ON whenever rocksdb was selected; it is now an explicit
    # knob so the bench can measure the provider and the checkpoint mode
    # separately (VERDICT r4 #5).
    changelog_checkpointing: bool | None = None
    # Number of shuffle/state partitions for the topology's stateful
    # operators (``spark.sql.shuffle.partitions`` at first start, pinned
    # into each query's checkpoint thereafter). The session default is
    # sized for batch scans; streaming state tasks should instead be sized
    # so each micro-batch task carries a few thousand rows — too many
    # partitions means per-batch task-scheduling overhead dominates
    # (measured at sf0.1 local[32]: 32 partitions -> 6.6-9.8s for the
    # fan-out topology, 8 partitions -> 2.8s, 3x throughput), too few
    # caps parallelism and per-task state grows unbounded. On a large
    # cluster the same knob moves the other way: ~2-3x total executor
    # cores. The session value is set at start_all and restored at
    # stop_all; micro-batches plan against the topology's value while the
    # topology runs.
    state_partitions: int | None = None
    # Fallback trigger for specs that don't set their own, e.g.
    # {"processingTime": "10 seconds"} or {"availableNow": True}.
    default_trigger: dict | None = None
    _queries: dict[str, StreamingQuery] = field(default_factory=dict)
    _prev_shuffle_partitions: str | None = field(default=None, repr=False)

    def add(self, spec: StreamQuerySpec) -> "Topology":
        self.specs.append(spec)
        return self

    def _apply_state_store(self) -> None:
        changelog_key = (
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
            ".enabled"
        )
        if self.changelog_checkpointing is not None:
            self.spark.conf.set(
                changelog_key,
                "true" if self.changelog_checkpointing else "false",
            )
        else:
            # The conf is session-global and sticky: without this unset, a
            # None topology would silently inherit whatever a prior topology
            # set on the same session instead of Spark's default (ADVICE r5).
            self.spark.conf.unset(changelog_key)
        if self.state_store is None:
            return
        provider = {
            "rocksdb": ROCKSDB_PROVIDER,
            "hdfs": "org.apache.spark.sql.execution.streaming."
            "state.HDFSBackedStateStoreProvider",
        }.get(self.state_store.lower(), self.state_store)
        self.spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", provider
        )

    def _apply_state_partitions(self) -> None:
        if self.state_partitions is None:
            return
        self._prev_shuffle_partitions = self.spark.conf.get(
            "spark.sql.shuffle.partitions"
        )
        self.spark.conf.set(
            "spark.sql.shuffle.partitions", str(self.state_partitions)
        )

    def start_all(self, available_now: bool = False) -> dict[str, StreamingQuery]:
        self._apply_state_store()
        self._apply_state_partitions()
        for spec in self.specs:
            writer = (
                spec.df.writeStream.outputMode(spec.output_mode)
                .queryName(spec.name)
                .option(
                    "checkpointLocation",
                    os.path.join(self.checkpoint_root, spec.name),
                )
                .foreachBatch(spec.sink)
            )
            if available_now:
                writer = writer.trigger(availableNow=True)
            elif spec.trigger or self.default_trigger:
                writer = writer.trigger(**(spec.trigger or self.default_trigger))
            self._queries[spec.name] = writer.start()
        return dict(self._queries)

    def await_all(self, timeout: float | None = None) -> None:
        for q in self._queries.values():
            q.awaitTermination(timeout)

    def await_any(self, timeout: float | None = None) -> None:
        self.spark.streams.awaitAnyTermination(timeout)

    def stop_all(self) -> None:
        for q in self._queries.values():
            if q.isActive:
                q.stop()
        if self._prev_shuffle_partitions is not None:
            self.spark.conf.set(
                "spark.sql.shuffle.partitions", self._prev_shuffle_partitions
            )
            self._prev_shuffle_partitions = None


def run_available_now(
    df: DataFrame,
    sink: ForeachBatchSink | Callable[[DataFrame, int], None],
    checkpoint: str,
    output_mode: str = "append",
    timeout_sec: float = 300.0,
) -> None:
    """Process all currently-available input through ``sink`` and stop."""
    query = (
        df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    query.awaitTermination(timeout_sec)
    if query.isActive:  # pragma: no cover - defensive stop on timeout
        query.stop()
        raise TimeoutError(f"streaming query did not finish in {timeout_sec}s")
