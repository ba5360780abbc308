"""Streaming observability: ``df.observe()`` metrics + a progress listener.

The reference pipeline has no monitoring at all (alerts are its only
signal); a production topology needs per-batch throughput/quality counters
that don't cost a second aggregation. Spark's ``Observation`` API computes
named aggregates *inside* the running query plan (piggybacked on the
existing pass — zero extra scans, works identically at 100 TB) and reports
them through ``StreamingQueryProgress``; this module wires the two ends:

- :func:`with_observed_metrics` attaches a standard metric set (row count,
  null-key count, exact value cents) to any streaming DataFrame.
- :class:`MetricsRecorder` is a ``StreamingQueryListener`` that collects the
  observed metrics per (query, batch) for dashboards/tests.

Cited reference gap: ``/root/reference/src/spark_streaming.py`` logs nothing
per batch; the operator-count alerting it does have is covered by
``streaming/sinks.py:with_alert``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from threading import Lock

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from ..functions.money import cents

__all__ = ["with_observed_metrics", "MetricsRecorder", "BatchMetrics"]


def with_observed_metrics(
    df: DataFrame,
    name: str = "metrics",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Attach in-plan observed metrics to a (streaming) DataFrame: row count,
    NULL-key count (data-quality canary), and the exact integer-cents value
    sum (order-independent, so the metric is deterministic run-to-run)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col(key_col).isNull(), 1)).alias("null_keys"),
        F.sum(cents(value_col)).alias("value_cents"),
    )


@dataclass
class BatchMetrics:
    query_name: str
    batch_id: int
    metrics: dict


@dataclass
class MetricsRecorder(StreamingQueryListener):
    """Collects observed-metric rows from streaming progress events.

    Thread-safe (listener callbacks arrive on Spark's listener bus thread);
    register with ``spark.streams.addListener(recorder)`` and read
    ``recorder.batches`` after/while queries run."""

    batches: list[BatchMetrics] = field(default_factory=list)
    _lock: Lock = field(default_factory=Lock, repr=False)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        progress = event.progress
        observed = progress.observedMetrics or {}
        if not observed:
            return
        with self._lock:
            for obs_name, row in observed.items():
                self.batches.append(
                    BatchMetrics(
                        query_name=progress.name or obs_name,
                        batch_id=progress.batchId,
                        metrics=row.asDict(),
                    )
                )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def totals(self) -> dict[str, dict]:
        """Roll up per-query totals across recorded batches."""
        out: dict[str, dict] = {}
        with self._lock:
            for b in self.batches:
                t = out.setdefault(
                    b.query_name, {"n_rows": 0, "null_keys": 0, "value_cents": 0}
                )
                for k in t:
                    v = b.metrics.get(k)
                    if v is not None:
                        t[k] += v
        return out
