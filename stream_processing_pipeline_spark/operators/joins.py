"""Join operators.

J1 — the reference's only join: a stream-static broadcast equi left-join of
the event stream against a small dimension table
(``/root/reference/src/spark_streaming.py:310-312``). :func:`dim_join`
generalizes it: explicit ``broadcast()`` on the dimension side so the plan is
a BroadcastHashJoin with **zero shuffle of the fact side** — at 100 TB the
fact table never moves; only the kilobyte-scale dimension is replicated to
executors. AQE would often choose this automatically in batch, but streaming
plans don't re-optimize per micro-batch, so the explicit hint stays.

:func:`fact_join` covers large-to-large joins: pre-repartition both sides on
the join key so repeated joins against the same key reuse one exchange
(Catalyst recognizes the co-partitioning), with optional key salting for
skew (AQE's skew-join handles batch skew; salting is for streaming or
pathological keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dim_join",
    "fact_join",
    "salted_join",
    "range_join",
    "asof_join",
    "interval_overlap_days",
    "normalized_pair_cols",
]


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | list[str],
    how: str = "left",
    dim_cols: list[str] | None = None,
) -> DataFrame:
    """Broadcast join a (small) dimension onto a fact stream/table.

    ``dim`` must be bounded INDEPENDENTLY of scale factor (nation/region,
    lookup tables, spines, scalar aggregates): the hint is honored
    unconditionally, so an sf-proportional side here — customer, orders,
    part, even nation-filtered slices of them — becomes an executor OOM at
    the 100 TB design point. For those, use a plain equi-join and let AQE
    broadcast at runtime when the side actually fits
    (tests/test_plans.py::test_no_broadcast_hint_on_fact_grain enforces
    this registry-wide)."""
    d = dim.select(*dim_cols) if dim_cols else dim
    return fact.join(F.broadcast(d), on, how)


def fact_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    partitions: int | None = None,
) -> DataFrame:
    """Shuffle join of two large tables, co-partitioned on the join key."""
    if partitions:
        left = left.repartition(partitions, *on)
        right = right.repartition(partitions, *on)
    return left.join(right, on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_src: Column | str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for hot join keys.

    A shuffle join hashes rows to reducers BY KEY, so one hot key (the
    celebrity user, the default event type) lands its entire row set on one
    task no matter how many executors exist — the classic long-tail straggler
    at 100 TB. Salting splits each key into ``n_salt`` sub-keys: the big
    (skewed) side gets a deterministic salt derived from ``salt_src`` (any
    per-row column — an id, not a random: results must be reproducible), the
    small side is replicated ``n_salt`` times with every salt value, and the
    join runs on ``(*on, _salt)`` — each hot key now spreads over ``n_salt``
    tasks. Output is IDENTICAL to the unsalted join (every left row still
    meets every matching right row exactly once), which is what the oracle
    of the query using this verifies; the salt column never leaves the join.

    AQE's skew-join handles many batch cases after the fact by splitting
    oversized partitions; explicit salting is for the cases it can't touch —
    streaming micro-batches (no per-batch re-optimization), skew the stats
    underestimate, or when the replicated side must co-partition with later
    stages. Cost: the small side is materialized ``n_salt``x (keep it
    dimension-sized) and the shuffle carries one extra int per row.
    """
    if how.lower().replace("_", "") not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        # right/full joins would emit each UNMATCHED right row once per
        # replica (n_salt copies) — not result-preserving. Salt the other
        # side instead (swap the arguments).
        raise ValueError(f"salted_join does not preserve '{how}' semantics")
    s = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    lt = left.withColumn("_salt", F.pmod(F.hash(s), F.lit(n_salt)))
    rt = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return lt.join(rt, [*on, "_salt"], how).drop("_salt")


def range_join(
    cover: DataFrame,
    probe: DataFrame,
    on: list[str],
    cover_interval: tuple[str, str],
    probe_interval: tuple[str, str],
    bucket_days: int = 28,
    *,
    interval_unit: str = "date",
    bucket_width: int | None = None,
    join_strategy: str | None = "merge",
) -> DataFrame:
    """Interval-overlap equi+range join via ASYMMETRIC bucketing — the
    general range-join strategy Spark lacks natively (a raw range predicate
    plans as BroadcastNestedLoop/cartesian; a per-key block filter goes
    quadratic the moment one key runs hot).

    Both inputs carry ``[start, end]`` interval columns (named by
    ``cover_interval`` / ``probe_interval``) on a shared axis — DATE,
    TIMESTAMP, or integral numeric, selected by ``interval_unit`` — plus
    shared equi-key columns ``on``; all non-``on`` column names must be
    disjoint across the two frames. The COVER side explodes its interval
    into fixed-width bucket keys; the PROBE side contributes only its START bucket (one row,
    no explode), and candidates come from the equi-join on
    ``(*on, bucket)`` — so the shuffle carries |cover-bucket rows| +
    |probe rows|, never 2x all-bucket rows (the symmetric two-sided explode
    measurably OOM'd a 1 GiB session at sf0.1 before this form replaced it).

    Returned rows: every (cover, probe) pair that shares the equi-keys,
    truly overlaps (``cover.start <= probe.end AND probe.start <=
    cover.end``, inclusive), **and has ``cover.start <= probe.start``** —
    exactly once (the probe's single start bucket means a pair can match in
    at most one bucket). The one-sided capture is COMPLETE for that
    orientation by the overlap ordering argument: when ``cover.start <=
    probe.start``, the probe's start lies inside the cover interval, so its
    start bucket is among the cover's exploded buckets. For a full
    both-orientations overlap join, union with the role-swapped call and
    dedup equal-start pairs; for a self-join, one call + pair normalization
    + DISTINCT suffices (see ``plans/batch.py::supplier_part_transit_
    overlaps``, the registered query re-expressed through this operator).

    Bucket width trades shuffle fan-out (long intervals explode into
    ``len/width`` rows) against candidate false-positive rate (coarser
    buckets admit more non-overlapping candidates for the exact predicate
    to discard); 28 days suits month-scale DATE intervals.

    Interval axes (``interval_unit``) — VERDICT r7 #3 generalized this
    beyond the original DATE-only bucketing so TIMESTAMP / numeric
    interval users get the library operator instead of reimplementing
    the asymmetric shape inline:

    - ``"date"`` (default): DATE columns; bucket = ``unix_date(col) div
      W`` with ``W = bucket_width or bucket_days`` in DAYS.
    - ``"timestamp"``: TIMESTAMP or TIMESTAMP_NTZ columns; bucket =
      ``unix_seconds(cast(col as timestamp)) div W`` with ``W =
      bucket_width`` in SECONDS (required; the cast is an identity for
      NTZ under the engine's pinned UTC session and required because
      NTZ cannot cast to long directly).
    - ``"numeric"``: integral columns (epoch micros, byte offsets,
      genomic coordinates, ...); bucket = ``col div W`` with ``W =
      bucket_width`` (required), in the column's own units.

    All three use Spark's ``div`` (truncation toward zero). For
    negative-valued axes the bucket function is still MONOTONIC
    non-decreasing, which is the only property completeness needs: the
    probe's start bucket always lies within ``[bucket(c0), bucket(c1)]``
    when ``c0 <= p0 <= c1`` — buckets straddling zero are merely up to
    ``2W-1`` units wide (more candidates, same exact result).
    """
    c0, c1 = cover_interval
    p0, p1 = probe_interval
    if interval_unit == "date":
        width = bucket_width if bucket_width is not None else bucket_days
        bucket = "unix_date({col}) div {w}"
    elif interval_unit == "timestamp":
        if bucket_width is None:
            raise ValueError(
                "interval_unit='timestamp' requires bucket_width (seconds)"
            )
        width = bucket_width
        bucket = "unix_seconds(cast({col} as timestamp)) div {w}"
    elif interval_unit == "numeric":
        if bucket_width is None:
            raise ValueError(
                "interval_unit='numeric' requires bucket_width"
            )
        width = bucket_width
        bucket = "{col} div {w}"
    else:
        raise ValueError(f"unknown interval_unit {interval_unit!r}")
    if width <= 0:
        raise ValueError(f"bucket width must be positive, got {width}")
    ex_cover = cover.withColumn(
        "_bk",
        F.explode(
            F.expr(
                "sequence("
                + bucket.format(col=c0, w=width)
                + ", "
                + bucket.format(col=c1, w=width)
                + ")"
            )
        ),
    )
    ex_probe = probe.withColumn(
        "_bk", F.expr(bucket.format(col=p0, w=width))
    )
    # Pin the candidate join to a shuffle strategy (default SortMergeJoin,
    # which also gets AQE skew-splitting). Catalyst's size estimate for an
    # exploded relation stays at the CHILD's sizeInBytes — sequence() length
    # is opaque to stats — so the exploded cover looks a few MB forever
    # while its true size grows with data x interval span: measured at
    # sf0.1 in a plain 10 MB-threshold session, the planner flipped this
    # join to a 500 MiB BroadcastExchange (r8 finding). The misestimate is
    # scale-INVARIANT, so unlike scan-level joins it never self-corrects at
    # cluster scale — it must be pinned here. ``join_strategy=None``
    # restores planner choice for callers probing a genuinely tiny cover.
    if join_strategy:
        ex_cover = ex_cover.hint(join_strategy)
    return (
        ex_cover.join(ex_probe, [*on, "_bk"])
        .filter(
            (F.col(c0) <= F.col(p1))
            & (F.col(p0) <= F.col(c1))
            & (F.col(c0) <= F.col(p0))
        )
        .drop("_bk")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    order_by: list[str],
    payload: list[str],
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """AS-OF join (pandas ``merge_asof`` / kdb ``aj`` semantics) as ONE
    union + ONE analytic window — the single-shuffle form that scales.

    For each ``left`` row, attach the ``payload`` columns of the LAST
    ``right`` row at-or-before it (``direction="backward"``) or the FIRST
    at-or-after it (``"forward"``) in ``order_by`` order within the same
    ``on`` key group. ``allow_exact_matches`` controls whether a right
    row tied on the FULL ``order_by`` tuple counts (pandas' parameter of
    the same name); with a unique tie-break column in ``order_by`` (e.g.
    an event id) ties cannot occur and the flag is moot.

    Columns: both inputs carry ``on`` + ``order_by``; ``right`` also
    carries ``payload``, whose names must not collide with ``left``'s.
    Output = every left row + the matched payload (NULL when no right row
    qualifies).

    Why not a join: the naive form is an inequality join (cartesian per
    key) + argmax; Spark plans that as BNLJ or a per-key sort in a
    self-join. The union trick instead tags both sides, sorts ONCE per
    key partition, and carries the latest payload forward with
    ``last(struct, ignorenulls)`` — one exchange on ``on``, no
    inequality join anywhere. The payload rides in a single struct so the
    matched columns are ATOMIC (all from the same right row) even when
    some payload values are NULL."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    # tag ordering decides whether an exact order_by tie on the right
    # side sorts before (counts) or after (doesn't) the left row
    right_first = allow_exact_matches == (direction == "backward")
    right_tag, left_tag = (0, 1) if right_first else (1, 0)
    rt = right.select(
        *on,
        *order_by,
        F.struct(*[F.col(c) for c in payload]).alias("_asof_payload"),
    ).withColumn("_asof_tag", F.lit(right_tag))
    lt = left.withColumn("_asof_tag", F.lit(left_tag)).withColumn(
        "_asof_payload",
        F.lit(None).cast(rt.schema["_asof_payload"].dataType),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    from pyspark.sql import Window

    keys = [F.col(k) for k in on]
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(*[F.col(c) for c in order_by], F.col("_asof_tag"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carried = F.last("_asof_payload", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*[F.col(c) for c in order_by], F.col("_asof_tag"))
            .rowsBetween(1, Window.unboundedFollowing)
        )
        carried = F.first("_asof_payload", ignorenulls=True).over(w)
    matched = u.withColumn("_asof_hit", carried).filter(
        F.col("_asof_tag") == left_tag
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_asof_hit.{c}").alias(c) for c in payload
    ]
    return matched.select(*out_cols)


def interval_overlap_days(
    a0: str, a1: str, b0: str, b1: str
) -> Column:
    """Inclusive overlap length in days of two DATE intervals — the
    post-:func:`range_join` measure both interval queries report:
    ``datediff(least(ends), greatest(starts)) + 1``."""
    return (
        F.datediff(F.least(a1, b1), F.greatest(a0, b0)).cast("long") + 1
    )


def normalized_pair_cols(
    a_first: Column, pairs: list[tuple[str, str, str]]
) -> list[Column]:
    """Unordered-pair normalization for :func:`range_join` self-joins.

    ``pairs`` is ``[(a_col, b_col, out_stem), ...]``; each yields two
    output columns ``{out_stem}_a`` / ``{out_stem}_b`` holding the
    (a, b) values swapped into canonical order when ``a_first`` is
    false. Both orientations of an equal-start pair then project to the
    SAME row, so a trailing DISTINCT collapses the double capture — the
    subtlety the range_join docstring documents; keeping it in one place
    stops the operator's consumers drifting on it."""
    out: list[Column] = []
    for a_col, b_col, stem in pairs:
        out.append(
            F.when(a_first, F.col(a_col)).otherwise(F.col(b_col))
            .alias(f"{stem}_a")
        )
        out.append(
            F.when(a_first, F.col(b_col)).otherwise(F.col(a_col))
            .alias(f"{stem}_b")
        )
    return out
