"""TPC-H-class relational analytics over the fixture star schema — the
general-purpose OLAP surface of the engine, exercised with one query per
classic plan shape:

- ``pricing_summary``    — Q1 flavor: wide partial-aggregate scan
- ``min_cost_supplier``  — Q2 flavor: correlated min + argmin join-back
- ``shipping_priority``  — Q3 flavor: fact join + top-k (TakeOrdered)
- ``order_priority``     — Q4 flavor: EXISTS semi-join with a non-equi term
- ``forecast_revenue``   — Q6 flavor: selective-predicate scan, no join
- ``nation_trade_matrix``— Q7 flavor: two-armed star join (supplier dim)
- ``nation_market_share``— Q8 flavor: conditional share of a deep star join
- ``product_profit``     — Q9 flavor: signed profit by nation x year
- ``returned_item_ranking`` — Q10 flavor: 3-way join + top-k
- ``important_part_values`` — Q11 flavor: group agg vs scalar-total threshold
- ``priority_shipping_buckets`` — Q12 flavor: two-bucket conditional counts
- ``customer_order_distribution`` — Q13 flavor: outer join + double agg
- ``promo_revenue_share``— Q14 flavor: conditional-aggregate ratio
- ``top_supplier_revenue`` — Q15 flavor: view + scalar max + join-back
- ``supplier_part_variety`` — Q16 flavor: distinct agg + NOT IN anti-join
- ``small_qty_revenue``  — Q17 flavor: correlated aggregate, decorrelated,
  with an exact integer cross-multiplied predicate
- ``big_order_customers``— Q18 flavor: HAVING aggregate gate + join-back
- ``disjunctive_revenue``— Q19 flavor: OR-of-conjunctions predicate
- ``excess_shipping_suppliers`` — Q20 flavor: nested agg + IN-subquery chain
- ``sole_latest_supplier`` — Q21 flavor: EXISTS + NOT EXISTS, decorrelated
- ``customers_no_orders``— Q22 flavor: NOT EXISTS anti-join
- ``brand_part_topk``    — top-k per group (WindowGroupLimit pushdown)
- ``revenue_rollup``     — ROLLUP multi-level aggregate (grouping_id)

With Q5 (``revenue_by_nation`` in pyfads.analytics_queries), all 22
classic TPC-H query shapes are represented (Q2/Q9/Q11/Q12/Q16/Q20/Q21
adapted to the fixtures' reduced schema — no partsupp table, no
shipmode/commitdate/receiptdate columns — keeping each query's canonical
plan shape).

Determinism discipline (same as pyfads.analytics_queries): every money
column in the fixtures is exact in cents / basis points (verified by
``round()`` probes), so all sums run in integer units — cents and
cents x bp "micros" — making results bit-identical under any partitioning
or AQE re-plan.  Averages are one final double division of two exact
integers.  At 100 TB the BIGINT micros sums approach 2^63 only past ~1e9
high-price rows per group; the charge sum (cents x bp x bp) therefore runs
as DECIMAL(38,0) and is emitted as the double it rounds to (both engines
round the same exact integer, so the doubles are bit-identical).

100 TB notes per query are in each docstring; the shared posture: dims
(region/nation) pinned broadcast, fact-fact joins shuffle on their keys
(or go shuffle-free when bucketed via pyfads.io.write_bucketed), top-k is
always TakeOrderedAndProject or WindowGroupLimit — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from pyfads.io import epoch_ms, read_table
from pyfads.queries import query

_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_DISC_BP = "CAST(round(l_discount * 10000) AS BIGINT)"
_TAX_BP = "CAST(round(l_tax * 10000) AS BIGINT)"


def _cents(col: str = "l_extendedprice") -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


def _bp(col: str) -> F.Column:
    return F.round(F.col(col) * 10000).cast("long")


# --------------------------------------------------------------------------
# Q1 flavor: pricing summary report
# --------------------------------------------------------------------------

_PRICING_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)      AS sum_qty,
       CAST(sum({_CENTS}) AS BIGINT)                        AS sum_base_cents,
       CAST(sum({_CENTS} * (10000 - {_DISC_BP})) AS BIGINT) AS sum_disc_micros,
       CAST(CAST(sum(CAST({_CENTS} * (10000 - {_DISC_BP}) AS DECIMAL(38,0))
                     * (10000 + {_TAX_BP})) AS DECIMAL(38,0)) AS VARCHAR)
           AS sum_charge_str,
       CAST(count(*) AS BIGINT)                             AS count_order,
       sum(CAST(l_quantity AS BIGINT)) / count(*)           AS avg_qty,
       sum({_CENTS}) / count(*)                             AS avg_price_cents,
       sum({_DISC_BP}) / count(*)                           AS avg_disc_bp
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_PRICING_SQL)
def pricing_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-flavored pricing summary: one full scan, 6 output groups.

    100 TB shape: the canonical map-side-combine aggregate — partial
    HashAggregate per scan task collapses everything to 6 rows before the
    single tiny exchange, so the shuffle moves ~6 x tasks rows regardless
    of input size.  The shipdate filter is pushed to the parquet scan
    (min/max row-group pruning).  Charge (cents x bp x bp) exceeds BIGINT
    range at large SF x group sizes, so it alone accumulates in
    DECIMAL(38,0) and is emitted as its exact DECIMAL STRING: at sf0.1 the
    integer already exceeds 2^53 and DuckDB's decimal->double cast proved
    1 ulp off the correctly-rounded value (measured r5), so no double is
    ever produced.  Averages are a final long/long double division — exact
    inputs, so deterministic."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '2001-06-30 00:00:00'")
    )
    qty = F.col("l_quantity").cast("long")
    disc_micros = _cents() * (F.lit(10000) - _bp("l_discount"))
    charge = disc_micros.cast("decimal(38,0)") * (F.lit(10000) + _bp("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("long").alias("sum_qty"),
        F.sum(_cents()).cast("long").alias("sum_base_cents"),
        F.sum(disc_micros).cast("long").alias("sum_disc_micros"),
        F.sum(charge).cast("decimal(38,0)").cast("string").alias("sum_charge_str"),
        F.count(F.lit(1)).cast("long").alias("count_order"),
        (F.sum(qty) / F.count(F.lit(1))).alias("avg_qty"),
        (F.sum(_cents()) / F.count(F.lit(1))).alias("avg_price_cents"),
        (F.sum(_bp("l_discount")) / F.count(F.lit(1))).alias("avg_disc_bp"),
    )


# --------------------------------------------------------------------------
# Q3 flavor: shipping priority — fact join + deterministic top-k
# --------------------------------------------------------------------------

_SHIPPING_SQL = f"""
SELECT l_orderkey,
       CAST(sum({_CENTS} * (10000 - {_DISC_BP})) AS BIGINT) AS revenue_micros,
       epoch_ms(o_orderdate) AS orderdate_ms,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_micros DESC, l_orderkey
LIMIT 10
"""


@query("shipping_priority", oracle=_SHIPPING_SQL)
def shipping_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-flavored: segment-filtered customers semi-filter orders,
    orders join lineitem, revenue per order, top 10.

    100 TB shape: the mktsegment filter prunes ~4/5 of customers at the
    scan; the filtered customer side is small relative to the facts, so
    AQE picks broadcast for it and only the orders-lineitem equi-join
    shuffles (on the order key — shuffle-free if bucketed).  The final
    top-10 is `orderBy().limit()` = TakeOrderedAndProject: per-partition
    heaps + one 10-row merge on the driver, never a global sort.  The
    (revenue DESC, orderkey) tie-break makes the result set unique, so
    LIMIT is deterministic on both engines."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'")
    )
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey).join(
        li, F.col("o_orderkey") == li.l_orderkey
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_cents() * (F.lit(10000) - _bp("l_discount")))
            .cast("long")
            .alias("revenue_micros")
        )
        .withColumn("orderdate_ms", epoch_ms(orders, "o_orderdate"))
        .select("l_orderkey", "revenue_micros", "orderdate_ms", "o_orderpriority")
        .orderBy(F.desc("revenue_micros"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4 flavor: order priority checking — EXISTS semi-join
# --------------------------------------------------------------------------

_PRIORITY_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


@query("order_priority", oracle=_PRIORITY_SQL)
def order_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-flavored: orders in a half-year window that had at least
    one line item shipped >30 days after the order date, counted per
    priority — the EXISTS → LEFT SEMI join shape.

    100 TB shape: the date filter prunes orders at the scan; the semi-join
    is an equi-join on the order key carrying the non-equi lateness term
    as a join-time filter — Spark plans shuffle/broadcast-hash semi-join
    (no row multiplication, left side emitted at most once), and the
    post-join aggregate collapses to 5 rows map-side."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-07-01 00:00:00'"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


# --------------------------------------------------------------------------
# Q22 flavor: customers with no orders — NOT EXISTS anti-join
# --------------------------------------------------------------------------

_NO_ORDERS_SQL = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
FROM customer c
WHERE c_acctbal > 0.0
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
"""


@query("customers_no_orders", oracle=_NO_ORDERS_SQL)
def customers_no_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-flavored: positive-balance customers dormant since 2000
    (no order on/after 2000-01-01), per market segment — the NOT EXISTS →
    LEFT ANTI join shape.

    100 TB shape: anti-join on the customer key; the probe side is
    column-pruned to (o_custkey) with the date filter pushed to its scan,
    and the aggregate collapses to 5 rows map-side.  With both tables
    bucketed on the customer key the anti-join is shuffle-free."""
    cust = read_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '2000-01-01 00:00:00'"))
        .select("o_custkey")
    )
    no_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("acctbal_cents"),
    )


# --------------------------------------------------------------------------
# Top-k per group: best-selling parts per brand (WindowGroupLimit)
# --------------------------------------------------------------------------

_BRAND_TOPK_SQL = f"""
WITH rev AS (
  SELECT p_brand, l_partkey,
         CAST(sum({_CENTS} * (10000 - {_DISC_BP})) AS BIGINT) AS revenue_micros
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, l_partkey
)
SELECT p_brand, l_partkey, revenue_micros, rank
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY p_brand
                ORDER BY revenue_micros DESC, l_partkey) AS BIGINT) AS rank
  FROM rev
)
WHERE rank <= 3
"""


@query("brand_part_topk", oracle=_BRAND_TOPK_SQL)
def brand_part_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue parts per brand — the top-k-per-group shape every
    analytics engine needs (reporting, leaderboard, per-key sampling).

    100 TB shape: part is dimension-sized relative to lineitem, so the
    enrich join broadcasts; revenue aggregates map-side on (brand,
    partkey); the rank<=3 filter plans as WindowGroupLimit, which pushes
    the per-group top-k *below* the window sort's exchange — each map task
    forwards at most 3 rows per brand instead of sorting whole
    partitions.  Ties broken by partkey → unique, deterministic rows."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(_cents() * (F.lit(10000) - _bp("l_discount")))
            .cast("long")
            .alias("revenue_micros")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("revenue_micros"), F.col("l_partkey")
    )
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "l_partkey", "revenue_micros", "rank")
    )


# --------------------------------------------------------------------------
# ROLLUP: revenue at (region, nation), (region), and grand-total levels
# --------------------------------------------------------------------------

_ROLLUP_SQL = f"""
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum({_CENTS} * (10000 - {_DISC_BP})) AS BIGINT) AS revenue_micros
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@query("revenue_rollup", oracle=_ROLLUP_SQL)
def revenue_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level ROLLUP over the star join: per-(region, nation), per-
    region subtotal, and grand total in one pass, disambiguated by
    grouping_id (Spark `grouping_id()` and DuckDB `GROUPING(a, b)` share
    the bit-vector convention).

    100 TB shape: identical join plan to revenue_by_nation (broadcast
    dims, one fact shuffle); ROLLUP expands each row to its 3 grouping
    sets *after* the partial aggregate, so the exchange still carries
    near-aggregated data (Spark plans Expand above the scan but the
    partial HashAggregate below the exchange collapses per task).  NULL
    grouping keys are coalesced to 'ALL' so row identity is total-ordered
    for the comparator."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    region = F.broadcast(read_table(spark, sf_dir, "region"))
    joined = (
        li.withColumn(
            "__rev", _cents() * (F.lit(10000) - _bp("l_discount"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum("__rev").cast("long").alias("revenue_micros"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "gid",
            "n_lineitems",
            "revenue_micros",
        )
    )


# --------------------------------------------------------------------------
# Q17 flavor: small-quantity-order revenue (correlated aggregate, decorrelated)
# --------------------------------------------------------------------------

_SMALL_QTY_SQL = f"""
WITH pa AS (
  SELECT l_partkey AS pa_partkey,
         CAST(count(*) AS BIGINT) AS n_li,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_small,
       CAST(sum({_CENTS}) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pa   ON l_partkey = pa_partkey
WHERE 5 * CAST(l_quantity AS BIGINT) * n_li < sum_qty
GROUP BY p_brand
"""


@query("small_qty_revenue", oracle=_SMALL_QTY_SQL)
def small_qty_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-flavored: revenue from line items whose quantity is below
    20% of their part's average order quantity, per brand — the correlated
    scalar-aggregate shape, decorrelated into a per-part aggregate + join.

    Exactness trick: ``q < 0.2 * avg(q)`` is evaluated as the
    cross-multiplied integer predicate ``5*q*n < sum_q`` — no float
    division anywhere, so the boundary rows are bit-deterministic on both
    engines (a double ``0.2 * avg`` could flip a row at the boundary).

    100 TB shape: the per-part aggregate is map-side-combined to one row
    per part; its join back to lineitem shuffles both sides on the part
    key (shuffle-free if bucketed on it); part is broadcast for the brand
    dimension."""
    li = read_table(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_li"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
    )
    part = F.broadcast(
        read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    )
    return (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .join(pa, li.l_partkey == F.col("pa_partkey"))
        .filter(
            F.lit(5) * F.col("l_quantity").cast("long") * F.col("n_li")
            < F.col("sum_qty")
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_small"),
            F.sum(_cents()).cast("long").alias("revenue_cents"),
        )
    )


# --------------------------------------------------------------------------
# Q7 flavor: trade volume between customer and supplier nations
# --------------------------------------------------------------------------

_TRADE_SQL = f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum({_CENTS} * (10000 - {_DISC_BP})) AS BIGINT) AS revenue_micros
FROM lineitem
JOIN orders    ON l_orderkey  = o_orderkey
JOIN customer  ON o_custkey   = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier  ON l_suppkey   = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY cn.n_name, sn.n_name
"""


@query("nation_trade_matrix", oracle=_TRADE_SQL)
def nation_trade_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-flavored: cross-border revenue per (customer nation,
    supplier nation) pair — the two-armed star join (the same fact joined
    through two independent dimension chains).

    100 TB shape: both nation copies broadcast; supplier is
    dimension-sized and broadcasts too, so the only fact-fact shuffle is
    orders-lineitem on the order key.  The inequality filter runs after
    the broadcasts, on 25x25 name pairs — no extra exchange.  Output is
    bounded at |nations|^2 rows via one map-side-combined agg."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = F.broadcast(read_table(spark, sf_dir, "supplier"))
    nation = read_table(spark, sf_dir, "nation")
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    return (
        li.withColumn("__rev", _cents() * (F.lit(10000) - _bp("l_discount")))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cn, cust.c_nationkey == F.col("cn_key"))
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum("__rev").cast("long").alias("revenue_micros"),
        )
    )


# --------------------------------------------------------------------------
# Q19 flavor: disjunctive brand/quantity predicate revenue
# --------------------------------------------------------------------------

_DISJ_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_matched,
       CAST(sum({_CENTS} * (10000 - {_DISC_BP})) AS BIGINT) AS revenue_micros
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)
"""


@query("disjunctive_revenue", oracle=_DISJ_SQL)
def disjunctive_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-flavored: revenue under an OR-of-conjunctions predicate
    mixing dimension attributes (brand) with fact attributes (quantity).

    100 TB shape: Catalyst extracts the common quantity bounds
    (1 <= q <= 30) as a pushable conjunct for the lineitem scan while the
    full disjunction evaluates post-join; part broadcasts.  One scan, one
    broadcast join, partial agg to a single row."""
    li = read_table(spark, sf_dir, "lineitem")
    part = F.broadcast(read_table(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    q = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#1") & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .filter(pred)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum(_cents() * (F.lit(10000) - _bp("l_discount")))
            .cast("long")
            .alias("revenue_micros"),
        )
    )


# --------------------------------------------------------------------------
# Q6 flavor: forecast revenue — pure selective-predicate scan + global agg
# --------------------------------------------------------------------------

_FORECAST_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_matched,
       CAST(sum({_CENTS} * {_DISC_BP}) AS BIGINT) AS discount_micros
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND {_DISC_BP} BETWEEN 500 AND 700
  AND l_quantity < 24
"""


@query("forecast_revenue", oracle=_FORECAST_SQL)
def forecast_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-flavored: would-have-been revenue of discounts in a band —
    the canonical selective-scan shape with NO join at all.

    100 TB shape: the shipdate range and quantity bound push to the
    parquet scan (row-group min/max pruning skips whole files outside the
    year); the discount-band test runs on exact basis points, not float
    equality.  Partial agg collapses each task to one row before the
    single bounded exchange (audited allowlist class: <= 1 row per
    partition)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & _bp("l_discount").between(500, 700)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum(_cents() * _bp("l_discount")).cast("long").alias("discount_micros"),
    )


# --------------------------------------------------------------------------
# Q10 flavor: returned-item customer ranking — 3-way join + top-k
# --------------------------------------------------------------------------

_RETURNED_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       CAST(sum({_CENTS} * (10000 - {_DISC_BP})) AS BIGINT) AS revenue_micros
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, acctbal_cents
ORDER BY revenue_micros DESC, c_custkey
LIMIT 20
"""


@query("returned_item_ranking", oracle=_RETURNED_SQL)
def returned_item_ranking_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-flavored: customers ranked by revenue of their RETURNED
    line items in a half-year window, with nation context.

    100 TB shape: the orderdate window prunes the orders scan and the
    returnflag filter prunes lineitem (both pushed); the orders-lineitem
    equi-join shuffles on the order key, the customer join on custkey, and
    nation is a pinned broadcast.  Top-20 is TakeOrderedAndProject with a
    total-order tie-break (revenue DESC, custkey), never a global sort."""
    cust = read_table(spark, sf_dir, "customer")
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1997-07-01 00:00:00'"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        orders.join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(nation, cust.c_nationkey == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        )
        .agg(
            F.sum(_cents() * (F.lit(10000) - _bp("l_discount")))
            .cast("long")
            .alias("revenue_micros")
        )
        .select("c_custkey", "c_name", "n_name", "acctbal_cents", "revenue_micros")
        .orderBy(F.desc("revenue_micros"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14 flavor: promo revenue share — conditional aggregate ratio
# --------------------------------------------------------------------------

_PROMO_SQL = f"""
SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN {_CENTS} * (10000 - {_DISC_BP}) ELSE 0 END) AS BIGINT)
           AS promo_micros,
       CAST(sum({_CENTS} * (10000 - {_DISC_BP})) AS BIGINT) AS total_micros,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN {_CENTS} * (10000 - {_DISC_BP}) ELSE 0 END) AS DOUBLE)
         / sum({_CENTS} * (10000 - {_DISC_BP})) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@query("promo_revenue_share", oracle=_PROMO_SQL)
def promo_revenue_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-flavored: share of revenue from PROMO-type parts in a
    quarter — the conditional-aggregate-ratio shape.

    100 TB shape: the shipdate window pushes to the lineitem scan; part
    broadcasts (a few 100 MB even at SF100k); one partial agg to a single
    row (audited allowlist class).  The ratio is one double division of
    two exact integer micros sums, so it is bit-stable under any
    partitioning."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-04-01 00:00:00'"))
    )
    part = F.broadcast(read_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    micros = _cents() * (F.lit(10000) - _bp("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", micros).otherwise(F.lit(0))
    agged = li.join(part, li.l_partkey == F.col("p_partkey")).agg(
        F.sum(promo).cast("long").alias("promo_micros"),
        F.sum(micros).cast("long").alias("total_micros"),
    )
    return agged.select(
        "promo_micros",
        "total_micros",
        (F.col("promo_micros").cast("double") / F.col("total_micros")).alias(
            "promo_share"
        ),
    )


# --------------------------------------------------------------------------
# Q18 flavor: large-quantity orders — HAVING aggregate gate + semi-join back
# --------------------------------------------------------------------------

_BIG_ORDER_QTY = 260  # ~p99 of per-order quantity: the gate keeps ~1%

_BIG_ORDERS_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, epoch_ms(o_orderdate) AS orderdate_ms,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       CAST(t.sum_qty AS BIGINT) AS sum_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > {_BIG_ORDER_QTY}
) t
JOIN orders   ON o_orderkey = t.l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


@query("big_order_customers", oracle=_BIG_ORDERS_SQL)
def big_order_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-flavored: customers holding orders whose total quantity
    exceeds a threshold — the HAVING-gate + join-back shape.

    100 TB shape: the quantity gate is ONE map-side-combined agg on the
    order key that collapses lineitem to (orderkey, sum) BEFORE any join;
    the tiny surviving set then drives the orders and customer joins (AQE
    turns them into broadcasts at real selectivities).  Never the naive
    join-then-having plan, which would shuffle full lineitem x orders."""
    li = read_table(spark, sf_dir, "lineitem")
    gated = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > _BIG_ORDER_QTY)
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return (
        gated.join(orders, gated.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            epoch_ms(orders, "o_orderdate").alias("orderdate_ms"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("totalprice_cents"),
            F.col("sum_qty").cast("long").alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q2 flavor: minimum-cost supplier per part (correlated min + argmin join-back)
# --------------------------------------------------------------------------
# The fixtures carry no partsupp table, so the part-supplier offer relation
# is derived from lineitem: a supplier's "offer" for a part is the minimum
# extended price (exact cents) it ever shipped that part at.  Same plan
# shape as TPC-H Q2: per-key min aggregate, argmin row recovered with a
# deterministic tie-break, dimension joins for supplier/nation context.

_MIN_COST_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS offer_cents
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT o.l_partkey, o.l_suppkey, o.offer_cents, s_name, n_name
  FROM offers o
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT p_partkey, p_brand, offer_cents, l_suppkey AS s_suppkey, s_name, n_name
FROM (
  SELECT eu.*, p_partkey, p_brand,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY offer_cents, l_suppkey) AS rn
  FROM eu JOIN part ON l_partkey = p_partkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
)
WHERE rn = 1
"""


@query("min_cost_supplier", oracle=_MIN_COST_SQL)
def min_cost_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-flavored: the cheapest EUROPE supplier for each mid-size
    STANDARD part — correlated-minimum + argmin join-back (offers derived
    from lineitem since the fixtures have no partsupp).

    100 TB shape: the offer aggregate map-side-combines to one row per
    (part, supplier); supplier/nation/region are broadcast; the argmin is
    a WindowGroupLimit (rn = 1 pushes the per-part top-1 below the window
    exchange).  Tie-break (offer, suppkey) makes the winner unique."""
    li = read_table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_cents()).cast("long").alias("offer_cents")
    )
    supp = F.broadcast(read_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    part = F.broadcast(
        read_table(spark, sf_dir, "part").filter(
            F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
        )
    )
    eu = (
        offers.join(supp, offers.l_suppkey == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(part, offers.l_partkey == F.col("p_partkey"))
    )
    w = Window.partitionBy("l_partkey").orderBy("offer_cents", "l_suppkey")
    return (
        eu.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "offer_cents",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
        )
    )


# --------------------------------------------------------------------------
# Q8 flavor: national market share per year (conditional share of a join)
# --------------------------------------------------------------------------

_MARKET_SHARE_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN sn.n_name = 'NATION_5'
                     THEN {_CENTS} * (10000 - {_DISC_BP}) ELSE 0 END) AS BIGINT)
           AS nation_micros,
       CAST(sum({_CENTS} * (10000 - {_DISC_BP})) AS BIGINT) AS total_micros,
       CAST(sum(CASE WHEN sn.n_name = 'NATION_5'
                     THEN {_CENTS} * (10000 - {_DISC_BP}) ELSE 0 END) AS DOUBLE)
         / sum({_CENTS} * (10000 - {_DISC_BP})) AS mkt_share
FROM lineitem
JOIN orders    ON l_orderkey  = o_orderkey
JOIN customer  ON o_custkey   = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region    ON cn.n_regionkey = r_regionkey
JOIN part      ON l_partkey   = p_partkey
JOIN supplier  ON l_suppkey   = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
GROUP BY o_year
"""


@query("nation_market_share", oracle=_MARKET_SHARE_SQL)
def nation_market_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-flavored: NATION_5 suppliers' share of STANDARD-part
    revenue sold to AMERICA-region customers, per order year — the
    conditional-share-of-a-deep-star-join shape.

    100 TB shape: five of the six joins are broadcasts (part, supplier,
    both nation copies, region); only orders-lineitem shuffles.  The share
    is one double division of two exact integer sums per year group."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    part = F.broadcast(
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    supp = F.broadcast(read_table(spark, sf_dir, "supplier"))
    nation = read_table(spark, sf_dir, "nation")
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_regionkey").alias("cn_region"),
        )
    )
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    region = F.broadcast(
        read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    micros = _cents() * (F.lit(10000) - _bp("l_discount"))
    nat = F.when(F.col("supp_nation") == "NATION_5", micros).otherwise(F.lit(0))
    agged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cn, cust.c_nationkey == F.col("cn_key"))
        .join(region, F.col("cn_region") == F.col("r_regionkey"))
        .join(part, li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(nat).cast("long").alias("nation_micros"),
            F.sum(micros).cast("long").alias("total_micros"),
        )
    )
    return agged.select(
        "o_year",
        "nation_micros",
        "total_micros",
        (F.col("nation_micros").cast("double") / F.col("total_micros")).alias(
            "mkt_share"
        ),
    )


# --------------------------------------------------------------------------
# Q9 flavor: product profit by supplier nation and year
# --------------------------------------------------------------------------
# No partsupp.ps_supplycost in the fixtures: unit cost is the part's
# retail price (exact cents), so profit = discounted revenue micros minus
# qty * retail_cents * 10000 — all integer, possibly negative.

_PROFIT_SQL = f"""
SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_CENTS} * (10000 - {_DISC_BP})
                - CAST(l_quantity AS BIGINT)
                  * CAST(round(p_retailprice * 100) AS BIGINT) * 10000)
            AS BIGINT) AS profit_micros
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
"""


@query("product_profit", oracle=_PROFIT_SQL)
def product_profit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-flavored: profit (revenue minus cost-of-goods, here the
    part's exact retail cents) per supplier nation and order year, for
    parts matching a name LIKE pattern (Q9's '%green%').

    100 TB shape: part (post-LIKE filter), supplier, and nation broadcast;
    orders-lineitem is the one shuffle; profit accumulates as BIGINT
    micros (signed — margins can be negative) with map-side combine to
    |nations| x |years| rows."""
    li = read_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(read_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    orders = read_table(spark, sf_dir, "orders")
    profit = _cents() * (F.lit(10000) - _bp("l_discount")) - F.col(
        "l_quantity"
    ).cast("long") * F.round(F.col("p_retailprice") * 100).cast("long") * F.lit(10000)
    return (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(profit).cast("long").alias("profit_micros"))
    )


# --------------------------------------------------------------------------
# Q11 flavor: important part values (group agg vs scalar-total threshold)
# --------------------------------------------------------------------------

_IMPORTANT_SQL = """
WITH vals AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
),
tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM vals)
SELECT l_partkey, value_cents
FROM vals CROSS JOIN tot
WHERE value_cents * 500 > total_cents
"""


@query("important_part_values", oracle=_IMPORTANT_SQL)
def important_part_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-flavored: parts whose shipped value through NATION_3
    suppliers exceeds 1/500 of that nation's total — the group-aggregate
    vs scalar-subquery-threshold shape.

    Exactness: the fraction test is the cross-multiplied integer predicate
    ``value * 500 > total`` — no float threshold, so boundary parts are
    bit-deterministic.

    100 TB shape: supplier+nation broadcast prune the scan to one
    nation's suppliers; one map-side-combined agg per part; the total is
    a 1-row re-aggregation cross-joined back (broadcast of one row), so
    the threshold filter is map-side — no second pass over lineitem."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = F.broadcast(read_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(
        read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    vals = (
        li.join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents()).cast("long").alias("value_cents"))
    )
    tot = F.broadcast(vals.agg(F.sum("value_cents").cast("long").alias("total_cents")))
    return (
        vals.crossJoin(tot)
        .filter(F.col("value_cents") * 500 > F.col("total_cents"))
        .select("l_partkey", "value_cents")
    )


# --------------------------------------------------------------------------
# Q12 flavor: priority buckets per line status (two-bucket conditional counts)
# --------------------------------------------------------------------------

_PRIORITY_BUCKETS_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


@query("priority_shipping_buckets", oracle=_PRIORITY_BUCKETS_SQL)
def priority_shipping_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-flavored: per line status (the fixtures' stand-in for
    ship mode), how many 1997-shipped lines belonged to high- vs
    low-priority orders — the two-bucket conditional-count shape.

    100 TB shape: the shipdate year pushes to the lineitem scan; the
    orders side is column-pruned to (o_orderkey, o_orderpriority); one
    equi-join shuffle on the order key (shuffle-free when bucketed), then
    a 2-row map-side-combined aggregate."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("int")).cast("long").alias("high_line_count"),
            F.sum((~high).cast("int")).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 flavor: customer order-count distribution (outer join + double agg)
# --------------------------------------------------------------------------

_CUST_DIST_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@query("customer_order_distribution", oracle=_CUST_DIST_SQL)
def customer_order_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-flavored: the distribution of per-customer order counts
    (excluding one priority class, the fixtures' stand-in for the comment
    exclusion) — LEFT OUTER join preserving zero-order customers, then a
    second aggregation over the first's result.

    100 TB shape: outer join shuffles on the customer key; count(col)
    ignores the NULLs the outer join manufactures, so zero-order
    customers land in the c_count=0 bucket; the second aggregate is over
    one row per customer and collapses map-side to the handful of
    distinct counts."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


# --------------------------------------------------------------------------
# Q15 flavor: top supplier(s) by quarterly revenue (view + scalar max)
# --------------------------------------------------------------------------

_TOP_SUPPLIER_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({_CENTS} * (10000 - {_DISC_BP})) AS BIGINT) AS total_micros
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_micros
FROM revenue
JOIN supplier ON s_suppkey = supplier_no
CROSS JOIN (SELECT max(total_micros) AS max_micros FROM revenue)
WHERE total_micros = max_micros
"""


@query("top_supplier_revenue", oracle=_TOP_SUPPLIER_SQL)
def top_supplier_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-flavored: the supplier(s) achieving the maximum revenue
    in 1997Q1 — the view + scalar-max + equality-join-back shape.

    100 TB shape: the revenue view is one map-side-combined agg to one
    row per supplier; the max is a 1-row re-aggregation broadcast back
    (never a global sort); supplier is a broadcast dim.  Exact integer
    micros make the equality test safe — a double revenue could miss the
    max row to 1 ulp."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-04-01 00:00:00'"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_cents() * (F.lit(10000) - _bp("l_discount")))
        .cast("long")
        .alias("total_micros")
    )
    mx = F.broadcast(revenue.agg(F.max("total_micros").alias("max_micros")))
    supp = F.broadcast(
        read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        revenue.crossJoin(mx)
        .filter(F.col("total_micros") == F.col("max_micros"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_micros")
    )


# --------------------------------------------------------------------------
# Q16 flavor: supplier variety per part attributes (distinct agg + NOT IN)
# --------------------------------------------------------------------------

_VARIETY_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@query("supplier_part_variety", oracle=_VARIETY_SQL)
def supplier_part_variety_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-flavored: how many distinct suppliers ship each (brand,
    type, size) combination, excluding one brand, PROMO types, and
    negative-balance suppliers (the fixtures' stand-in for Q16's
    complaint-comment NOT IN subquery).

    100 TB shape: the part-supplier relation is lineitem collapsed to
    distinct (partkey, suppkey) pairs — one map-side-combined distinct;
    part and the (tiny) excluded-supplier list broadcast, the exclusion
    planning as a broadcast LEFT ANTI join; count(DISTINCT) re-shuffles
    once on the group keys."""
    li = read_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    part = F.broadcast(
        read_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & ~F.col("p_type").like("PROMO%")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
    )
    bad_supp = F.broadcast(
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(part, ps.l_partkey == F.col("p_partkey"))
        .join(bad_supp, ps.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20 flavor: high-volume suppliers of a part class (nested agg + semi-joins)
# --------------------------------------------------------------------------

_EXCESS_SQL = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 1
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(CAST(l_quantity AS BIGINT)) > 50
  )
"""


@query("excess_shipping_suppliers", oracle=_EXCESS_SQL)
def excess_shipping_suppliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-flavored: region-1 suppliers that moved more than 50
    units of some PROMO part during 1997 — the nested-aggregate +
    IN-subquery-chain shape (Q20's availqty threshold becomes a shipped-
    quantity threshold; the fixtures have no partsupp).

    100 TB shape: the inner aggregate map-side-combines to one row per
    (supplier, part); the PROMO part list and the qualifying supplier set
    are both broadcast semi-joins; supplier+nation are dimension-sized.
    Nothing rescans lineitem twice."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
    )
    promo = F.broadcast(
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    movers = (
        li.join(promo, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = F.broadcast(
        read_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    )
    return (
        supp.join(nation, supp.s_nationkey == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(movers), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# --------------------------------------------------------------------------
# Q21 flavor: sole-latest supplier on multi-supplier orders
# (EXISTS another supplier + NOT EXISTS a later one, via double aggregation)
# --------------------------------------------------------------------------

_SOLE_LATEST_SQL = """
WITH t AS (
  SELECT l_orderkey, l_suppkey, max(epoch_ms(l_shipdate)) AS smax_ms
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
o AS (
  SELECT l_orderkey, max(smax_ms) AS omax_ms,
         CAST(count(*) AS BIGINT) AS n_supp
  FROM t GROUP BY l_orderkey
),
at_max AS (
  SELECT t.l_orderkey, t.l_suppkey
  FROM t JOIN o USING (l_orderkey)
  WHERE o.n_supp >= 2 AND t.smax_ms = o.omax_ms
),
blamed AS (
  SELECT l_orderkey, min(l_suppkey) AS l_suppkey
  FROM at_max GROUP BY l_orderkey
  HAVING count(*) = 1
)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM blamed JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 10
"""


@query("sole_latest_supplier", oracle=_SOLE_LATEST_SQL)
def sole_latest_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-flavored: on finished multi-supplier orders, the supplier
    that was UNIQUELY last to ship (EXISTS another supplier on the order,
    NOT EXISTS one shipping as late), counted per supplier, top 10 — the
    double-correlated-subquery shape, decorrelated into two aggregation
    passes instead of two correlated rescans of lineitem.

    100 TB shape: pass 1 collapses lineitem to one row per (order,
    supplier) map-side; pass 2 is per-order over that (already tiny)
    frame; both shuffle on the order key — with lineitem bucketed by
    orderkey the whole chain is shuffle-free until the final per-supplier
    count.  The top-10 is TakeOrderedAndProject with a total-order
    tie-break."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    t = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(epoch_ms(li, "l_shipdate")).alias("smax_ms"))
    )
    o = t.groupBy(F.col("l_orderkey").alias("o_key")).agg(
        F.max("smax_ms").alias("omax_ms"),
        F.count(F.lit(1)).cast("long").alias("n_supp"),
    )
    at_max = (
        t.join(o, t.l_orderkey == F.col("o_key"))
        .filter((F.col("n_supp") >= 2) & (F.col("smax_ms") == F.col("omax_ms")))
        .select("l_orderkey", "l_suppkey")
    )
    blamed = (
        at_max.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("l_suppkey"),
            F.count(F.lit(1)).alias("n_at_max"),
        )
        .filter(F.col("n_at_max") == 1)
    )
    supp = F.broadcast(
        read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        blamed.join(supp, blamed.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(10)
    )
