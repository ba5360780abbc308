"""Spark 4 ``transformWithStateInPandas`` stateful processors.

The engine's custom-stateful-operator surface has two tiers:

- ``applyInPandasWithState`` (plans/streamq.py ``stream_user_stats``) — the
  Spark 3.x-era GroupState API; runs everywhere, gate-verified.
- ``transformWithStateInPandas`` (THIS module) — the Spark 4 stateful
  processor API: typed value/list/map state handles, TTL, event/processing
  time timers, and state-schema evolution. This is the API you'd pick on a
  real cluster: state lives in RocksDB, per-state-variable handles avoid
  packing everything into one tuple, and timers replace hand-rolled timeout
  bookkeeping.

Environment gate (documented, like the Kafka/SMTP paths): the
transformWithState state-server protocol serializes state requests with
protobuf, so the Python side needs ``google.protobuf`` at RUNTIME. This
container does not ship protobuf, so ``HAS_TWS_RUNTIME`` is False here and
the execution test skips; the builder and processor classes import and
construct fine regardless (only query start needs the wire protocol), and
``tests/test_stateful_tws.py`` pins both halves: construction always, a full
stream/batch-equivalence run wherever protobuf exists.

Usage::

    from stream_processing_pipeline_spark.streaming.stateful import (
        user_stats_transform_with_state,
    )
    stats = user_stats_transform_with_state(narrow_df)   # groupBy + TWS
    stats.writeStream...   # requires RocksDB state store (ROCKSDB_PROVIDER)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "CDC_OUT_SCHEMA",
    "CDC_STATE_SCHEMA",
    "cdc_champion_update",
    "RATE_LIMIT_K",
    "RATE_WIN_US",
    "RATE_OUT_SCHEMA",
    "RATE_STATE_SCHEMA",
    "rate_limit_update",
    "HAS_TWS_RUNTIME",
    "RunningStatsProcessor",
    "SESSION_GAP_US",
    "SESSION_OUT_SCHEMA",
    "SESSION_STATE_SCHEMA",
    "session_timeout_update",
    "user_stats_transform_with_state",
    "IVM_OUT_SCHEMA",
    "IVM_STATE_SCHEMA",
    "ivm_retract_update",
]

try:  # runtime wire protocol only; the API classes themselves need no protobuf
    import google.protobuf  # noqa: F401

    HAS_TWS_RUNTIME = True
except ImportError:  # pragma: no cover - depends on environment
    HAS_TWS_RUNTIME = False


USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
    ]
)


def _make_processor():
    """Build the StatefulProcessor class lazily (keeps module import cheap)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningStatsProcessor(StatefulProcessor):
        """Per-key running (count, cents-sum) in a typed ValueState.

        The transformWithState twin of ``stream_user_stats``'s GroupState
        closure: state is a named value-state handle with an explicit DDL
        schema (``n BIGINT, c BIGINT``), which Spark versions and validates
        via the state-schema file — renaming or retyping a field is caught
        at query start instead of corrupting checkpoints silently.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, c BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, c = self._agg.get() if self._agg.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                c += int(pdf["c"].sum())
            self._agg.update((n, c))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [c]}
            )

        def close(self) -> None:
            pass

    return RunningStatsProcessor


def RunningStatsProcessor():  # noqa: N802 - factory with class semantics
    """Instantiate the running-stats StatefulProcessor."""
    return _make_processor()()


def user_stats_transform_with_state(
    narrow: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Apply the running-stats processor to a ``(user_id, c)`` stream.

    ``narrow`` must have a long ``c`` column (cents). The returned stream
    emits one cumulative ``(user_id, n_events, total_cents)`` row per key
    per micro-batch — identical emission contract to ``stream_user_stats``,
    so a one-file availableNow run equals the batch groupBy.

    Scale: state is one 16-byte struct per key in RocksDB; the shuffle per
    batch is one row per touched key. Requires the RocksDB state store
    provider (``streaming.runner.ROCKSDB_PROVIDER``) — transformWithState
    refuses the default HDFS-backed provider by design.
    """
    return narrow.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(),
        outputStructType=USER_STATS_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ------------------------------------------------ CDC champion (GroupState)

CDC_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
        StructField("op", StringType()),
        StructField("vc", LongType()),
        StructField("n_ops", LongType()),
    ]
)

CDC_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
        StructField("op", StringType()),
        StructField("vc", LongType()),
        StructField("n", LongType()),
    ]
)


def cdc_champion_update(key, pdfs, state):
    """GroupState update for the streaming CDC upsert
    (plans/streamq.py ``stream_cdc_apply``): keep ONE champion tuple per
    key — the op with the max (ts_us, event_id) — plus an op counter,
    merging each micro-batch's vectorized argmax against carried state.
    Module-level so multi-batch semantics are unit-testable
    (tests/test_cdc_and_skew.py) independent of the registered query's
    one-file fixture run."""
    import pandas as pd

    best = state.get if state.exists else None
    n = best[4] if best else 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        top = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
        cand = (
            int(top["ts_us"]),
            int(top["event_id"]),
            str(top["op"]),
            int(top["vc"]),
        )
        if best is None or cand[:2] > tuple(best[:2]):
            best = (*cand, n)
        else:
            best = (*best[:4], n)
    if best is None:
        # No carried state and only empty batches (reachable if a timeout
        # mode ever fires this function for a key with no new rows):
        # nothing to emit, nothing to store.
        return
    state.update(best)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "ts_us": [best[0]],
            "event_id": [best[1]],
            "op": [best[2]],
            "vc": [best[3]],
            "n_ops": [best[4]],
        }
    )


# ------------------------------------------- event-time-timeout sessions

#: inactivity gap that closes a session (microseconds)
SESSION_GAP_US = 30 * 60 * 1_000_000

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("closed_by", StringType()),  # "gap" | "timeout"
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def session_timeout_update(key, pdfs, state):
    """GroupState update for TIMER-DRIVEN sessionization
    (``GroupStateTimeout.EventTimeTimeout``) — the streaming surface the
    windowed forms can't express: a session must CLOSE (and emit exactly
    once) when the watermark passes ``last_event + gap``, i.e. when the
    stream has proven no more events can join it — without waiting for
    the user's next event, which may never come. ``session_window``
    aggregation emits on the same condition but can't attach arbitrary
    per-session state or side effects; this operator is the template for
    ones that do (abandoned-cart alerts, SLA breach emission, device
    offline detection).

    Contract per micro-batch:

    - timed-out invocation (``state.hasTimedOut``): emit the carried
      session tagged ``closed_by='timeout'`` and drop state — the
      exactly-once close;
    - data invocation: merge carried state with the batch's rows in
      event-time order; every gap > ``SESSION_GAP_US`` inside the merged
      timeline closes a session immediately (``closed_by='gap'``); the
      trailing open session goes back into state with its event-time
      timer re-armed at ``last_us + gap`` (via
      ``state.setTimeoutTimestamp``, milliseconds), so inactivity closes
      it in a later batch.

    Sessions still open when the stream ends stay in state (a restart
    with more data resumes them) — tests pin that they are NOT emitted.
    State per key is one 24-byte tuple; emission is one row per closed
    session. Module-level so multi-batch timeout semantics are
    unit-testable (tests/test_stateful_tws.py)."""
    import pandas as pd

    def emit(start, last, n, how):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start_us": [start],
                "session_last_us": [last],
                "n_events": [n],
                "closed_by": [how],
            }
        )

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield emit(start, last, n, "timeout")
        return

    times: list[int] = []
    for pdf in pdfs:
        if len(pdf):
            times.extend(int(v) for v in pdf["ts_us"])
    if not times:
        return  # nothing new; any armed timer stays armed
    times.sort()

    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = times[0], times[0], 0

    for t in times:
        if t - last > SESSION_GAP_US:
            yield emit(start, last, n, "gap")
            start, n = t, 0
        # Late rows (t <= last) can reach arbitrary stateful operators —
        # watermark filtering only drops input for built-in aggregations —
        # so merge them conservatively: they extend the current session's
        # bounds instead of moving `last` backwards (which would corrupt
        # the gap check and re-arm the timer too early).
        start = min(start, t)
        last = max(last, t)
        n += 1
    state.update((start, last, n))
    # Event-time timers take MILLISECONDS and must be set ABOVE the
    # current watermark (Spark rejects a stale timer); a session whose
    # gap already expired relative to arriving data times out at the
    # next watermark tick instead. The division rounds UP: the gap check
    # treats t - last == SESSION_GAP_US as inside the session, so a
    # floor-truncated timer (up to 999 us early) could close the session
    # before an event landing exactly on the inclusive boundary arrives.
    timeout_ms = -(-(last + SESSION_GAP_US) // 1000)
    state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))


# ------------------------------------------- fixed-window rate limiting

#: admissions allowed per key per window
RATE_LIMIT_K = 5
#: window width in event-time microseconds (1 minute)
RATE_WIN_US = 60 * 1_000_000

RATE_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_admitted", LongType()),
        StructField("n_suppressed", LongType()),
        StructField("last_win", LongType()),
    ]
)

RATE_STATE_SCHEMA = StructType(
    [
        StructField("win", LongType()),       # newest window seen
        StructField("n_in_win", LongType()),  # admits consumed in it
        StructField("n_events", LongType()),  # cumulative totals
        StructField("n_admitted", LongType()),
    ]
)


def rate_limit_update(key, pdfs, state):
    """GroupState update for FIXED-WINDOW per-key rate limiting — the
    production-standard admission rule (API quotas, alert throttling,
    abuse damping): admit the first ``RATE_LIMIT_K`` events of each
    (key, event-time window), suppress the rest. Fixed windows are the
    variant with a CLOSED FORM over the event log (admission = event's
    rank within its window), which is what makes this streaming operator
    batch-oracle-verifiable — token-bucket/sliding variants are
    recursive in prior admissions and cannot be stated in one SQL pass.

    State per key is O(1): (newest window, admits consumed in it,
    cumulative totals). Within a batch, events are processed in
    (ts_us, event_id) order — deterministic under any input file order.
    Cross-batch contract: exact while batches respect event-time window
    order per key (the fixture's availableNow run is one batch, so the
    registered query is exact); an out-of-order LATE window arriving
    after state advanced past it is re-counted from zero — the standard
    limiter trade, stated rather than hidden (a watermark-keyed map
    state would close it at the cost of unbounded window state)."""
    import pandas as pd

    if state.exists:
        win0, n_in_win, n_events, n_admitted = state.get
    else:
        win0, n_in_win, n_events, n_admitted = -1, 0, 0, 0

    rows = [p for p in pdfs if len(p)]
    if not rows:
        return
    pdf = pd.concat(rows).sort_values(["ts_us", "event_id"])
    wins = (pdf["ts_us"] // RATE_WIN_US).to_numpy()
    rank_in_win = pd.Series(wins).groupby(wins).cumcount().to_numpy()
    carried = (wins == win0) * n_in_win
    admitted = (rank_in_win + carried) < RATE_LIMIT_K

    n_events += len(pdf)
    n_admitted += int(admitted.sum())
    last_win = int(wins[-1])
    admits_in_last = int(admitted[wins == last_win].sum()) + (
        n_in_win if last_win == win0 else 0
    )
    state.update((last_win, admits_in_last, n_events, n_admitted))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_events],
            "n_admitted": [n_admitted],
            "n_suppressed": [n_events - n_admitted],
            "last_win": [last_win],
        }
    )


# ------------------------------------------------- retract-stream IVM deltas

IVM_LOW, IVM_MID = 2000, 10000  # cents band edges (match the batch twin)

IVM_OUT_SCHEMA = StructType(
    [
        StructField("band", StringType()),
        StructField("dk", IntegerType()),
        StructField("dc", LongType()),
    ]
)

IVM_STATE_SCHEMA = StructType([StructField("c", LongType())])


def _ivm_band(c: int) -> str:
    return "low" if c < IVM_LOW else ("mid" if c < IVM_MID else "high")


def ivm_retract_update(key, pdfs, state):
    """Per-key retract-stream producer: for every upsert/delete log entry
    emit a retraction of the key's previous state and an addition for its
    new one — the Flink retract-channel contract. State is O(1) per live
    key (the current value); a delete removes the state row entirely.
    Cross-batch contract: batches deliver a key's rows in event-time
    order (sorted within each batch here), so a retraction at the head of
    batch N+1 references the state written by batch N."""
    import pandas as pd

    cur = state.get[0] if state.exists else None
    bands: list[str] = []
    dks: list[int] = []
    dcs: list[int] = []
    rows = [p for p in pdfs if len(p)]
    if rows:
        pdf = pd.concat(rows).sort_values(["ord_ts", "event_id"])
        for op, c in zip(pdf["op"], pdf["c"]):
            if cur is not None:  # retract the previous state
                bands.append(_ivm_band(cur))
                dks.append(-1)
                dcs.append(-cur)
            cur = int(c) if op == "U" else None
            if cur is not None:  # addition for the new state
                bands.append(_ivm_band(cur))
                dks.append(1)
                dcs.append(cur)
    if cur is None:
        state.remove()
    else:
        state.update((cur,))
    yield pd.DataFrame({"band": bands, "dk": dks, "dc": dcs})
