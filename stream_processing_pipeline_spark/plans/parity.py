"""The six reference queries (SURVEY.md §2.10), re-expressed on ``events``.

The reference computes over NYC-taxi trips; the driver fixtures provide the
``events`` stream-table analog (FIXTURES.md §B): ``ts`` -> pickup_datetime,
``value`` -> total_amount, ``event_type`` -> payment_type-style category
('purchase' ~ credit_card, 'click' ~ cash), ``user_id`` -> location id,
``props`` JSON -> the raw wire payload, ``customer`` -> the zone-lookup
dimension. Semantics per query mirror
``/root/reference/src/spark_streaming.py`` (cites inline); each also runs in
streaming mode via :mod:`..streaming` (these registered forms are the batch
equivalents the oracle can verify — for a finite input, watermark + append
finalization yields exactly this grouping, a property pinned by the
stream/batch equivalence tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import avg_money_sql
from ..functions.rounding import pround_sql
from . import transforms
from .common import HOUR, WINDOW_FLATTEN_SQL, catalog
from .registry import register

_K_SQL = "CAST(json_extract_string(props, '$.k') AS INTEGER)"
# Portable seconds-since-epoch (truncating, like Spark's cast to long).
_EPOCH = "CAST(floor(epoch({0})) AS BIGINT)"
_TS_SEC = _EPOCH.format("ts")
_DAY_SEC = _EPOCH.format("date_trunc('day', ts)")
_MINS = f"({_TS_SEC} - {_DAY_SEC}) / 60"


@register(
    "q1_typed_events",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value, {_K_SQL} AS prop_k
    FROM events
    """,
    tags=("parity", "P1", "P2", "P3"),
)
def q1_typed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 raw persistence: parse the JSON payload and emit the typed record
    (reference ``spark_streaming.py:127-138`` with the P2/P3 parse+cast)."""
    return transforms.typed_events(catalog(spark, sf_dir).events)


@register(
    "q2_abnormal_minutes",
    oracle=f"""
    WITH base AS (
      SELECT event_id, ts, user_id, event_type, {_MINS} AS mins FROM events
    )
    SELECT event_id, ts, user_id, event_type,
           {pround_sql('mins', 2)} AS minutes_since_midnight
    FROM base WHERE mins < 60 OR mins > 1380
    """,
    tags=("parity", "P6", "P7", "P11"),
)
def q2_abnormal_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 abnormal duration: epoch-arithmetic derivation + disjunctive range
    filter + rounding (reference ``spark_streaming.py:155-193``; the fixture
    analog of trip-duration is minutes-since-midnight of the event time)."""
    return transforms.abnormal_minutes(catalog(spark, sf_dir).events)


@register(
    "q3_value_discrepancy",
    oracle=f"""
    WITH base AS (
      SELECT event_id, ts, user_id, value,
             abs(value - {_K_SQL}) AS d
      FROM events
    )
    SELECT event_id, ts, user_id, value, {pround_sql('d', 2)} AS amount_discrepancy
    FROM base WHERE d > 50 OR value IS NULL
    """,
    tags=("parity", "P8", "P9"),
)
def q3_value_discrepancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 abnormal fee: |observed - expected| > tolerance OR observed NULL,
    with reference-exact NULL propagation (``spark_streaming.py:196-239``).
    The JSON prop ``k`` plays the recomputed-components role."""
    return transforms.value_discrepancy(catalog(spark, sf_dir).events)


_PURCHASE = "CASE WHEN event_type = 'purchase' THEN value END"
_CLICK = "CASE WHEN event_type = 'click' THEN value END"


@register(
    "q4_avg_value_per_hour",
    oracle=f"""
    SELECT {WINDOW_FLATTEN_SQL},
           {avg_money_sql('value')} AS avg_value,
           {avg_money_sql(_PURCHASE)} AS purchase_avg,
           {avg_money_sql(_CLICK)} AS click_avg
    FROM events WHERE value IS NOT NULL
    GROUP BY {HOUR}
    """,
    tags=("parity", "A1", "W1", "W2", "P13"),
)
def q4_avg_value_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 hourly avg revenue + conditional (pivot-style) averages per
    category (reference ``spark_streaming.py:242-269``). Money aggregated via
    exact integer cents (see functions.money) so results are deterministic on
    a distributed cluster."""
    return transforms.avg_value_per_hour(catalog(spark, sf_dir).events)


@register(
    "q5_event_counts_per_hour",
    oracle=f"""
    SELECT {WINDOW_FLATTEN_SQL},
           count(*) AS total_events,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_events,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click_events
    FROM events
    GROUP BY {HOUR}
    """,
    tags=("parity", "A2", "W1", "W2"),
)
def q5_event_counts_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 hourly trip counts + conditional counts — ``count(CASE ...)``
    counts non-NULLs, intentionally distinct from ``count(*)`` (reference
    ``spark_streaming.py:272-298``)."""
    return transforms.event_counts_per_hour(catalog(spark, sf_dir).events)


@register(
    "q6_counts_by_segment",
    oracle=f"""
    SELECT {WINDOW_FLATTEN_SQL},
           c_mktsegment AS segment,
           count(user_id) AS total_events
    FROM events LEFT JOIN customer ON user_id = c_custkey
    GROUP BY {HOUR}, c_mktsegment
    """,
    tags=("parity", "J1", "A3"),
)
def q6_counts_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 hourly counts per borough: prune -> broadcast left-join the
    dimension -> two-key windowed count (reference
    ``spark_streaming.py:301-337``). The fact side never shuffles for the
    join — only for the aggregation — which is the 100 TB-safe plan."""
    cat = catalog(spark, sf_dir)
    return transforms.counts_by_segment(cat.events, cat.customer)


# ----------------- declarative spec compiler under the gate (round 12)
#
# The §7.1 pipeline-spec layer (streaming/spec.py) compiles the checked-in
# reference_events.json into the same plans the code-first transforms
# build. These two registrations put the COMPILER ITSELF under the
# external value-hash gate: each runs its query compiled FROM THE SPEC
# (batch mode) against the code-built twin's oracle VERBATIM — a compiler
# bug (op wiring, macro arithmetic, watermark handling) hash-mismatches
# here even if every hand-built query stays green. One stateless chain
# (derive/filter/select + @pround/@minutes_since_midnight/@outside
# macros) and the full join+agg chain (prune/dim_join/windowed_agg/rename
# + window flattening) cover the vocabulary's two shapes.

def _spec_sources(spark: SparkSession, sf_dir: str) -> dict:
    cat = catalog(spark, sf_dir)
    return {"events": cat.events, "customer": cat.customer}


def _spec_compiled(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..streaming.spec import (
        REFERENCE_EVENTS_SPEC_PATH,
        compile_query,
        load_spec,
    )

    spec = load_spec(REFERENCE_EVENTS_SPEC_PATH)
    return compile_query(spec, name, _spec_sources(spark, sf_dir))


@register(
    "spec_q2_abnormal_minutes",
    oracle=f"""
    WITH base AS (
      SELECT event_id, ts, user_id, event_type, {_MINS} AS mins FROM events
    )
    SELECT event_id, ts, user_id, event_type,
           {pround_sql('mins', 2)} AS minutes_since_midnight
    FROM base WHERE mins < 60 OR mins > 1380
    """,
    tags=("parity", "spec-compiler", "declarative", "P6", "P7", "P11"),
)
def spec_q2_abnormal_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 compiled FROM the JSON pipeline spec (derive -> filter -> select
    with @minutes_since_midnight/@outside/@pround macro expansion); the
    oracle is q2_abnormal_minutes' verbatim, so the gate hash-verifies the
    spec compiler's stateless chain end-to-end. Same plan class as the
    code-built twin: one Project/Filter tree inside whole-stage codegen."""
    return _spec_compiled(spark, sf_dir, "abnormal_minutes")


@register(
    "spec_q6_counts_by_segment",
    oracle=f"""
    SELECT {WINDOW_FLATTEN_SQL},
           c_mktsegment AS segment,
           count(user_id) AS total_events
    FROM events LEFT JOIN customer ON user_id = c_custkey
    GROUP BY {HOUR}, c_mktsegment
    """,
    tags=("parity", "spec-compiler", "declarative", "J1", "A3"),
)
def spec_q6_counts_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 compiled FROM the JSON pipeline spec (prune -> dim_join ->
    windowed_agg -> rename); oracle is q6_counts_by_segment's verbatim.
    The compiled plan keeps the code twin's scale shape — broadcast dim
    join (fact side unshuffled), one aggregation exchange."""
    return _spec_compiled(spark, sf_dir, "counts_by_segment")


@register(
    "spec_q4_avg_value_per_hour",
    oracle=f"""
    SELECT {WINDOW_FLATTEN_SQL},
           {avg_money_sql('value')} AS avg_value,
           {avg_money_sql(_PURCHASE)} AS purchase_avg,
           {avg_money_sql(_CLICK)} AS click_avg
    FROM events WHERE value IS NOT NULL
    GROUP BY {HOUR}
    """,
    tags=("parity", "spec-compiler", "declarative", "A1", "W2", "P13"),
)
def spec_q4_avg_value_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 compiled FROM the JSON pipeline spec (not_null -> windowed_agg
    with @avg_money macro aggs); oracle is q4_avg_value_per_hour's
    verbatim. This is the gate row for the MONEY-MACRO arithmetic — the
    one macro family the other two spec registrations don't reach: a
    drifted cents/rounding expansion (e.g. the DECIMAL-literal trap the
    batch-equivalence test caught in development) hash-mismatches here."""
    return _spec_compiled(spark, sf_dir, "avg_value_per_hour")


@register(
    "spec_q1_typed_events",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value, {_K_SQL} AS prop_k
    FROM events
    """,
    tags=("parity", "spec-compiler", "declarative", "P1", "P2", "P3"),
)
def spec_q1_typed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 compiled FROM the JSON pipeline spec (parse_json -> select);
    oracle is q1_typed_events' verbatim. This is the gate row for the
    compiler's ``parse_json`` op — the schema-applying JSON flatten (P2/P3
    contract wiring) that the other spec rows exercise only indirectly
    through ``derive``. With the other five, the full reference topology
    now runs from the checked-in spec with EVERY query externally
    hash-gated in both its code-built and spec-compiled form."""
    return _spec_compiled(spark, sf_dir, "typed_events")


@register(
    "spec_q3_value_discrepancy",
    oracle=f"""
    WITH base AS (
      SELECT event_id, ts, user_id, value,
             abs(value - {_K_SQL}) AS d
      FROM events
    )
    SELECT event_id, ts, user_id, value, {pround_sql('d', 2)} AS amount_discrepancy
    FROM base WHERE d > 50 OR value IS NULL
    """,
    tags=("parity", "spec-compiler", "declarative", "P8", "P9"),
)
def spec_q3_value_discrepancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 compiled FROM the JSON pipeline spec (parse_json ->
    discrepancy_filter -> select); oracle is q3_value_discrepancy's
    verbatim. Gate row for the compiler's ``discrepancy_filter`` op — the
    NULL-propagating |observed - expected| predicate (P8/P9) whose
    OR-isNull branch is the easiest thing for a spec wiring bug to drop
    silently (the row count barely moves; the hash does not lie)."""
    return _spec_compiled(spark, sf_dir, "value_discrepancy")


@register(
    "spec_q5_event_counts_per_hour",
    oracle=f"""
    SELECT {WINDOW_FLATTEN_SQL},
           count(*) AS total_events,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_events,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click_events
    FROM events
    GROUP BY {HOUR}
    """,
    tags=("parity", "spec-compiler", "declarative", "A2", "W1", "W2"),
)
def spec_q5_event_counts_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 compiled FROM the JSON pipeline spec (bare windowed_agg with
    @count_if conditional-count macros); oracle is
    q5_event_counts_per_hour's verbatim. Gate row for the count(CASE)
    vs count(*) distinction surviving macro expansion — a compiler that
    expands conditional counts to count(*) over a filter matches on
    total_events and mismatches on the conditional columns."""
    return _spec_compiled(spark, sf_dir, "event_counts_per_hour")
