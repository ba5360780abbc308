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
from .sinks import ForeachBatchSink, with_alert

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
    sinks: dict[str, ForeachBatchSink] = field(default_factory=dict)

    def _sink(self, name: str) -> ForeachBatchSink:
        self.sinks[name] = self.sink_factory(name)
        return self.sinks[name]

    def build(self, topology: Topology) -> Topology:
        ev = self.events_stream
        wm = self.watermark

        q1 = transforms.typed_events(ev)
        topology.add(StreamQuerySpec("typed_events", q1, self._sink("typed_events")))

        q2 = transforms.abnormal_minutes(ev)
        q2_sink = self._sink("abnormal_minutes")
        if self.alerter:
            q2_sink = with_alert(q2_sink, self.alerter, "abnormal_minutes")
        topology.add(StreamQuerySpec("abnormal_minutes", q2, q2_sink))

        q3 = transforms.value_discrepancy(ev)
        q3_sink = self._sink("value_discrepancy")
        if self.alerter:
            q3_sink = with_alert(q3_sink, self.alerter, "value_discrepancy")
        topology.add(StreamQuerySpec("value_discrepancy", q3, q3_sink))

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
