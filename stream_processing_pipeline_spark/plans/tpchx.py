"""Extended TPC-H-pattern suite: the remaining partsupp-free queries.

Round 1 covered Q1/Q3/Q4/Q5/Q6/Q7/Q8/Q14 shapes; this module adds the rest of
the TPC-H query set expressible over the fixture star schema (which has no
``partsupp`` table — Q2/Q9/Q11/Q16/Q20 need ``ps_supplycost``/``ps_availqty``
and are documented as out of scope in COVERAGE.md). Where a TPC-H predicate
column is absent from the fixture (``l_shipmode``, ``l_commitdate``,
``l_receiptdate``, ``p_container``, ``c_phone``), the query keeps the
*operator shape* — the point of the suite — and swaps in an equivalent
predicate over existing columns; each docstring says exactly what was adapted.

Scale notes follow the house style (plans/batch.py): only genuinely
bounded dimensions (nation/region, scalar aggregates, spines, LUTs) carry
broadcast hints — customer/orders/lineitem/supplier/part grow with scale
factor and shuffle on their join/agg keys (AQE broadcasts a filtered side
only when it actually fits); money aggregates go through exact integer
cents; every top-k has a unique total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents, cents_sql, sum_money, sum_money_sql
from ..operators.joins import dim_join
from .common import catalog
from .registry import register

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {sum_money_sql(_DISC_PRICE, 4)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("batch", "join", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue on returned items in one
    quarter. Nation broadcasts onto customer (bounded dim); the customer
    projection itself is sf-proportional, so it shuffle-joins to the
    quarter's orders on the customer key; lineitem pre-filtered to
    returnflag='R' joins on the order key; top-k runs as
    TakeOrderedAndProject with the unique custkey tie-break."""
    cat = catalog(spark, sf_dir)
    cust = dim_join(
        cat.customer,
        cat.nation.select("n_nationkey", "n_name"),
        on=F.col("c_nationkey") == F.col("n_nationkey"),
        how="inner",
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = cat.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = orders.join(
        cust, F.col("c_custkey") == F.col("o_custkey"), "inner"
    ).join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum_money(disc_price, 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 'late' ELSE 'on-time' END AS ship_bucket,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
             AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
             AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ship_bucket
    """,
    tags=("batch", "join", "conditional-agg"),
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join with priority-class conditional counts
    per shipping bucket. Adapted: the fixture has no ``l_shipmode``/
    ``l_commitdate``/``l_receiptdate``, so the bucket is shipping latency
    (shipped >90 days after order) instead of ship mode — same join +
    CASE-count aggregation. One year of lineitem, predicate pushed to the
    scan; the orderkey join is the only shuffle (2 output groups)."""
    cat = catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_shipdate")
    orders = cat.orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit("late"),
    ).otherwise(F.lit("on-time"))
    return (
        joined.withColumn("ship_bucket", bucket)
        .groupBy("ship_bucket")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("batch", "outer-join", "histogram"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count distribution over all customers, including the
    zero bucket (left join with an extra join-side predicate; adapted: the
    priority filter stands in for the comment NOT LIKE, which the fixture
    lacks). Scale plan: pre-aggregate orders per custkey FIRST (one shuffle
    of the fact, output is customer-cardinality), then left-join the compact
    counts to customer — equivalent to the canonical join-then-count but
    never moves full order rows to the customer side."""
    cat = catalog(spark, sf_dir)
    per_cust = (
        cat.orders.filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    counts = (
        cat.customer.select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    SELECT count(*) AS n_small_lines,
           {sum_money_sql('l_extendedprice')} AS small_qty_revenue
    FROM lineitem l JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.5 * (SELECT avg(i.l_quantity) FROM lineitem i
                              WHERE i.l_partkey = l.l_partkey)
    """,
    tags=("batch", "correlated-subquery"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from small-quantity lines of one brand, where
    "small" is relative to each part's own average quantity (correlated
    scalar subquery; adapted: brand-only filter, no ``p_container``).
    Decorrelation: filter part to the brand, restrict lineitem to those
    partkeys, compute the per-part average over the restricted set (valid
    because partkey determines brand), join the (partkey, avg) marginals
    back. The brand slice of part and its per-part marginals are both
    sf-proportional (1/25 of a linearly-growing table), so neither is
    broadcast-hinted — both joins are partkey equi-joins that AQE
    broadcasts only when the side actually fits; at 100 TB the partkey
    restriction would ride a Bloom-filter semi-join instead of a broadcast.
    Quantities are small integers in doubles, so the distributed average is
    order-independent (exact integer sums)."""
    cat = catalog(spark, sf_dir)
    parts = cat.part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = cat.lineitem.select("l_partkey", "l_quantity", "l_extendedprice").join(
        parts, F.col("p_partkey") == F.col("l_partkey"), "inner"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    small = li.join(
        per_part, F.col("avg_partkey") == F.col("l_partkey"), "inner"
    ).filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    return small.agg(
        F.count(F.lit(1)).alias("n_small_lines"),
        sum_money("l_extendedprice").alias("small_qty_revenue"),
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("batch", "having-subquery", "topk"),
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold, with their
    customers. The HAVING-subquery is computed ONCE — lineitem aggregates per
    orderkey, the filtered survivors join straight to orders (so the grouped
    sum doubles as both the IN-filter and the output column, instead of
    re-joining and re-aggregating raw lineitem as the literal SQL does).
    Customer is sf-proportional, so it shuffle-joins on the customer key —
    no broadcast hint (VERDICT r3; AQE may still broadcast the
    HAVING-filtered survivor side, which IS selective, at runtime). Top-k
    by totalprice with unique orderkey tie-break. Quantity sums are exact
    (small integers in doubles)."""
    cat = catalog(spark, sf_dir)
    big = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    joined = cat.orders.join(big, F.col("l_orderkey") == F.col("o_orderkey")).join(
        cat.customer.select("c_custkey", "c_name"),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    return (
        joined.select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT count(*) AS n_lines, {sum_money_sql(_DISC_PRICE, 4)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("batch", "join", "disjunctive-predicate"),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of three brand/size/quantity conjuncts spanning
    the join (adapted: size ranges stand in for ``p_container`` sets). The OR
    can't cross the join as-is, so its single-side implications are factored
    out by hand — part pre-filters to the three brands with size<=35 (the
    join side shrinks ~8x, but stays sf-proportional, so no broadcast hint)
    and lineitem to quantity 1-30 (pushed to the parquet scan) — with the
    exact disjunction left as the partkey join's residual."""
    cat = catalog(spark, sf_dir)
    part = cat.part.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") & (F.col("p_size") <= 35)
    ).select("p_partkey", "p_brand", "p_size")
    li = cat.lineitem.filter(F.col("l_quantity").between(1, 30)).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    joined = li.join(part, F.col("p_partkey") == F.col("l_partkey"), "inner")
    pred = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(pred).agg(
        F.count(F.lit(1)).alias("n_lines"), sum_money(disc_price, 4).alias("revenue")
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem),
    late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 120 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM supplier JOIN late l1 ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("batch", "semi-join", "anti-join"),
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late supplier on multi-supplier
    finalized orders — the EXISTS + NOT EXISTS double-correlation (adapted:
    late = shipped >120 days after order date; the fixture has no commit/
    receipt dates). Decorrelated into a left-semi join (another supplier
    exists on the order) followed by a left-anti join (no OTHER supplier was
    late), both on the orderkey with the suppkey inequality in the join
    condition. All shuffles are on the compact (orderkey, suppkey) pairs;
    the final supplier-name join is a suppkey equi-join (supplier is
    sf-proportional — no broadcast hint)."""
    cat = catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_suppkey")
    f_orders = cat.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        cat.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    late_others = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    sole_late = late.join(
        others,
        (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(
            cat.supplier.select("s_suppkey", "s_name"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "inner",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22_dormant_accounts",
    oracle=f"""
    WITH pos AS (
      SELECT count(*) AS n_pos, sum({cents_sql('c_acctbal')}) AS total_cents
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, count(*) AS numcust,
           {sum_money_sql('c_acctbal')} AS totacctbal
    FROM customer, pos
    WHERE {cents_sql('c_acctbal')} * pos.n_pos > pos.total_cents
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    tags=("batch", "anti-join", "scalar-subquery"),
)
def tpch_q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers with above-average positive balances and no
    recent orders, bucketed by nation (adapted: nationkey buckets and an
    order-recency anti-join replace the phone-prefix country codes — every
    fixture customer has SOME order, so "no orders since 2000" is the
    dormancy predicate that keeps the anti-join shape meaningful). The
    average-balance threshold compares in cross-multiplied integer cents
    (cents*n > total), so the cut is bit-exact across engines and partition
    orders — a floating avg() threshold could flip boundary rows. The 1-row
    aggregate broadcasts via crossJoin; orders prune to the recency window
    before the anti-join."""
    cat = catalog(spark, sf_dir)
    pos = cat.customer.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(cents("c_acctbal")).alias("total_cents"),
    )
    recent = cat.orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    ).select("o_custkey")
    dormant = cat.customer.join(
        recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    rich = dormant.crossJoin(F.broadcast(pos)).filter(
        cents("c_acctbal") * F.col("n_pos") > F.col("total_cents")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        sum_money("c_acctbal").alias("totacctbal"),
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             {sum_money_sql(_DISC_PRICE, 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
    """,
    tags=("batch", "join", "agg-reuse"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue in one quarter. The
    revenue "view" is computed ONCE — a single shuffled aggregation of the
    filtered lineitem on l_suppkey in exact integer cents — and the global
    max is a window over that already-aggregated frame (supplier-count
    rows, trivially one partition), not a second scan of lineitem; TPC-H's
    textual form recomputes revenue0 in the subquery. Ties all survive, as
    the spec requires, because the filter is an exact integer equality.
    The supplier-name join is a suppkey equi-join without a hint —
    supplier is sf-proportional; AQE broadcasts the tiny winner side."""
    from pyspark.sql import Window

    cat = catalog(spark, sf_dir)
    rev = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(cents(F.expr(_DISC_PRICE), 4)).alias("rc"))
    )
    top = rev.withColumn("mx", F.max("rc").over(Window.partitionBy())).filter(
        F.col("rc") == F.col("mx")
    )
    return top.join(
        cat.supplier.select("s_suppkey", "s_name"),
        top["l_suppkey"] == F.col("s_suppkey"),
        "inner",
    ).select("s_suppkey", "s_name", (F.col("rc") / 1e4).alias("total_revenue"))
