"""The six-query reference topology over an events stream.

Mirrors ``/root/reference/src/spark_streaming.py:340-360``: six concurrent
queries off one parsed lineage — raw persistence, two anomaly detectors with
alert hooks, and three watermarked windowed aggregations (one with a
broadcast dimension join) — here expressed over the generalized operators
with pluggable sinks.

Note the reference's topology shares *code*, not *execution*: each query
re-reads the source with its own checkpoint (SURVEY.md §3.2). This builder
keeps that model (it is the only one Structured Streaming supports for
independent queries) — at scale each query is an independent consumer group
whose Kafka read is bounded by ``maxOffsetsPerTrigger``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..plans import transforms
from .alerts import Alerter
from .runner import StreamQuerySpec, Topology
from .sinks import FanOutSink, ForeachBatchSink, with_alert

__all__ = ["EventsTopologyBuilder"]

WATERMARK = "60 minutes"  # reference parity (spark_streaming.py:245,274,315)


@dataclass
class EventsTopologyBuilder:
    """Assemble the six parity queries into a :class:`Topology`.

    ``sink_factory(name)`` supplies a sink per query (JDBC in production,
    memory/parquet in tests); ``alerter`` receives Q2/Q3 anomaly alerts.
    """

    events_stream: DataFrame
    customer_dim: DataFrame
    sink_factory: Callable[[str], ForeachBatchSink]
    alerter: Alerter | None = None
    watermark: str = WATERMARK
    # Attach in-plan observed ingest metrics (rows, null keys, exact value
    # cents) to the shared source lineage; every query then reports them per
    # batch via StreamingQueryProgress (collect with observe.MetricsRecorder).
    # Zero extra scans — the aggregates ride the existing pass.
    observe_metrics: bool = False
    sinks: dict[str, ForeachBatchSink] = field(default_factory=dict)

    def _sink(self, name: str) -> ForeachBatchSink:
        self.sinks[name] = self.sink_factory(name)
        return self.sinks[name]

    def build(self, topology: Topology, fanout_stateless: bool = False) -> Topology:
        """Assemble the topology. ``fanout_stateless=True`` merges the three
        stateless queries (raw persistence + the two anomaly detectors) into
        ONE streaming query via :class:`FanOutSink` — one source read and
        one checkpoint instead of three (4 queries total instead of 6). The
        three watermarked aggregations keep their own queries either way:
        their state belongs to a per-query checkpoint. Sink contents are
        identical in both modes (pinned by ``test_fanout_topology_equivalence``)."""
        ev = self.events_stream
        if self.observe_metrics:
            from .observe import with_observed_metrics

            ev = with_observed_metrics(ev, name="ingest")
        wm = self.watermark

        q2_sink = self._sink("abnormal_minutes")
        if self.alerter:
            q2_sink = with_alert(q2_sink, self.alerter, "abnormal_minutes")
        q3_sink = self._sink("value_discrepancy")
        if self.alerter:
            q3_sink = with_alert(q3_sink, self.alerter, "value_discrepancy")

        if fanout_stateless:
            fan = FanOutSink(
                routes=[
                    ("typed_events", transforms.typed_events, self._sink("typed_events")),
                    ("abnormal_minutes", transforms.abnormal_minutes, q2_sink),
                    ("value_discrepancy", transforms.value_discrepancy, q3_sink),
                ]
            )
            topology.add(StreamQuerySpec("stateless_fanout", ev, fan))
        else:
            q1 = transforms.typed_events(ev)
            topology.add(
                StreamQuerySpec("typed_events", q1, self._sink("typed_events"))
            )
            topology.add(
                StreamQuerySpec(
                    "abnormal_minutes", transforms.abnormal_minutes(ev), q2_sink
                )
            )
            topology.add(
                StreamQuerySpec(
                    "value_discrepancy", transforms.value_discrepancy(ev), q3_sink
                )
            )

        q4 = transforms.avg_value_per_hour(ev, watermark=wm)
        topology.add(
            StreamQuerySpec("avg_value_per_hour", q4, self._sink("avg_value_per_hour"))
        )

        q5 = transforms.event_counts_per_hour(ev, watermark=wm)
        topology.add(
            StreamQuerySpec(
                "event_counts_per_hour", q5, self._sink("event_counts_per_hour")
            )
        )

        q6 = transforms.counts_by_segment(ev, self.customer_dim, watermark=wm)
        topology.add(
            StreamQuerySpec("counts_by_segment", q6, self._sink("counts_by_segment"))
        )
        return topology
