"""Scale-technique queries: join-shuffle reduction and skew mitigation.

Two techniques a 100 TB join pipeline leans on constantly, expressed as
operators whose RESULTS are provably identical to the naive plan (both
queries verify against the plain-join oracle — the technique changes the
physical shape only):

- **Bloom-prefiltered semi-join** (:mod:`..operators.bloom`): broadcast an
  8 KiB bitmap of the key set and drop non-matching rows BEFORE the join
  shuffle. False positives ride to the exact join; false negatives cannot
  happen; the shuffle shrinks from |big| to ~|matching| rows.
- **Salted join** (:func:`..operators.joins.salted_join`): split each hot
  join key over ``n_salt`` reducers (deterministic per-row salt on the big
  side, replicated small side) so one celebrity key cannot serialize the
  stage. ``events.event_type`` has 5 values — an extreme hot-key join that
  unsalted would run on 5 effective tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents, cents_sql
from ..operators.bloom import bloom_bitmap, bloom_prefilter
from ..operators.joins import salted_join
from .common import catalog
from .registry import register


@register(
    "bloom_semijoin_nation_suppliers",
    oracle=f"""
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum({cents_sql('l.l_extendedprice')}) AS BIGINT)
             AS total_price_cents
    FROM lineitem l
    WHERE l.l_suppkey IN (
      SELECT s.s_suppkey FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_9'
    )
    GROUP BY l.l_returnflag
    """,
    tags=("batch", "semi-join", "bloom", "shuffle-reduction"),
)
def bloom_semijoin_nation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems supplied from one nation (4% of rows at sf0.1), via Bloom
    prefilter + exact semi-join: the 8 KiB bitmap of the nation's supplier
    keys prunes the lineitem scan BEFORE the join shuffle (measured 96% of
    rows dropped pre-shuffle at sf0.1), the left-semi join then removes
    Bloom false positives, so the result is exact — the oracle is the plain
    semi-join. At 100 TB the bitmap roundtrip is still n_bits/8 bytes,
    independent of key count; this is the explicit form of what runtime
    row-level bloom filtering does opportunistically, usable where the
    optimizer won't inject it (streaming, pre-computed key sets,
    cross-job reuse)."""
    cat = catalog(spark, sf_dir)
    keys = (
        cat.supplier.join(
            F.broadcast(cat.nation.filter(F.col("n_name") == "NATION_9")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
        .distinct()
    )
    words = bloom_bitmap(keys, "s_suppkey")
    pre = bloom_prefilter(cat.lineitem, words, "l_suppkey")
    matched = pre.join(
        keys, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    return matched.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(cents("l_extendedprice")).alias("total_price_cents"),
    )


@register(
    "salted_join_type_stats",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             (CAST(sum({cents_sql('value')}) AS BIGINT)
              // CAST(count(*) AS BIGINT)) AS mean_cents
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN {cents_sql('e.value')} > s.mean_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above_mean
    FROM events e JOIN stats s ON s.event_type = e.event_type
    GROUP BY e.event_type
    """,
    tags=("batch", "join", "skew", "salted"),
)
def salted_join_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events joined to per-type mean stats THROUGH the salted join — the
    5-value event_type key is the worst-case hot key (an unsalted shuffle
    join runs on 5 effective reducers regardless of cluster size; salting
    by event_id spreads each type over n_salt tasks). The oracle is the
    plain join: a green row proves salting changed the physical plan only.
    The integer floor-mean keeps the threshold engine-exact. The sort-merge
    hint forces the shuffle-join shape salting exists for — with a 5-row
    right side Spark would otherwise broadcast, which is the correct
    UNSKEWED choice; real salted joins have dimension-sized right sides
    that exceed the broadcast threshold."""
    ev = catalog(spark, sf_dir).events
    stats = ev.groupBy("event_type").agg(
        F.floor(
            F.sum(cents("value")) / F.count(F.lit(1))
        ).cast("long").alias("mean_cents")
    )
    joined = salted_join(
        ev.withColumn("c", cents("value")),
        stats.hint("merge"),
        on=["event_type"],
        salt_src="event_id",
        n_salt=8,
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("c") > F.col("mean_cents"), 1).otherwise(0)
        ).alias("n_above_mean"),
    )
