"""End-to-end multi-join analytics suite (TPC-H-shaped; SURVEY.md §2 C2-C23
composed).

The registry already verifies every operator in isolation; these five
queries exercise them *composed* the way a warehouse user actually would
— 3-to-6-table star joins with selective filters, grouped revenue math,
and deterministic top-k — adapted to the driver fixtures' columns
(TESTDATA.md). They are the shape Catalyst's join planning, AQE, and
dynamic partition pruning exist for, and the plan tests in
``tests/test_plan_quality.py`` pin the physical shape we want at 100 TB:

* filters reach the parquet scans (``PushedFilters`` on the fact side);
* the fixed-cardinality dims (``nation`` 25 rows, ``region`` 5 rows) are
  explicitly ``broadcast()`` — they are constant-size at any scale
  factor, so the hint is safe at 100 TB, unlike ``customer``/``supplier``
  which grow with SF and are left to shuffle joins + AQE;
* no cartesian products anywhere;
* top-k orders are made total (revenue DESC, then key) so the LIMIT is
  deterministic on both engines.

Reference parity: the reference has no analytics queries at all (its one
query is ``SELECT * FROM db.t``, sharding_recreation.py:159-160); this
suite is Tier C surface per SURVEY.md §2.

All revenue sums go through :func:`~._util.dec_sum` (exact decimal
accumulation) so Spark's parallel partial aggregates and DuckDB's serial
sum produce bit-identical doubles for the driver's value-hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import table
from ._util import dec_sum, sql_dec_sum

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q3 analog: shipping priority — top unshipped-revenue orders for a segment
# --------------------------------------------------------------------------

_SHIPPING_PRIORITY_SQL = f"""
SELECT o.o_orderkey,
       {sql_dec_sum(_REVENUE, 6)} AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@query("shipping_priority_topk", _SHIPPING_PRIORITY_SQL)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter -> 3-way join -> grouped revenue -> top-10.

    Scale posture: both filters are pushed into the scans, so the join
    inputs are already reduced ~5x (segment) / by date before any
    shuffle. ``customer`` and ``orders`` grow with SF, so no broadcast
    hint — the equi-joins shuffle on their keys and AQE may still elect
    a broadcast at small SF. The final top-10 compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort).
    """
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(_revenue_col(), 6).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5 analog: local supplier volume — revenue where customer and supplier
# share a nation, per nation of one region
# --------------------------------------------------------------------------

_LOCAL_SUPPLIER_SQL = f"""
SELECT n.n_name,
       {sql_dec_sum(_REVENUE, 6)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


@query("local_supplier_volume", _LOCAL_SUPPLIER_SQL)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join, same-nation constraint, per-nation revenue.

    Scale posture: ``nation``/``region`` are fixed 25/5 rows at ANY scale
    factor — broadcast them (the region filter then prunes suppliers
    before the fact join). The ``c_nationkey = s_nationkey`` residual
    rides the ``l_suppkey`` equi-join as an extra equi-condition, so
    Catalyst keeps a hash join (no theta explosion). ``customer``,
    ``orders``, ``supplier`` scale with SF and shuffle on their keys.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # region filter -> nations of that region (25-row side, broadcast)
    asia_nations = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    s = table(spark, sf_dir, "supplier").join(
        asia_nations, F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dec_sum(_revenue_col(), 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# Q10 analog: returned-item report — top customers by returned revenue
# --------------------------------------------------------------------------

_RETURNED_ITEM_SQL = f"""
SELECT c.c_custkey,
       c.c_name,
       {sql_dec_sum(_REVENUE, 6)} AS revenue,
       c.c_acctbal,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("returned_item_report", _RETURNED_ITEM_SQL)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: one quarter of returned items, top-20 lossy customers.

    Scale posture: the ``l_returnflag = 'R'`` and quarter filters are
    pushed to the scans (~1/12 of orders x 1/3 of lineitems survive
    before the shuffle). ``nation`` is broadcast; the grouped revenue
    aggregates map-side before the top-20 TakeOrderedAndProject.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(_revenue_col(), 6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q18 analog: large-volume customers — orders whose total quantity clears
# a threshold, via an aggregated semi-join
# --------------------------------------------------------------------------

_LARGE_VOLUME_SQL = """
SELECT c.c_name,
       c.c_custkey,
       o.o_orderkey,
       o.o_orderdate,
       o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(30,4))) > 250
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@query("large_volume_customers", _LARGE_VOLUME_SQL)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: grouped-HAVING subquery drives a semi-join.

    Scale posture: the qualifying-order set is computed by a grouped
    aggregation over ``lineitem`` (map-side partial sums, one shuffle on
    ``l_orderkey``), then semi-joined back — it stays distributed, never
    collected. The threshold keeps the qualifying set tiny (~0.1% of
    orders), so AQE turns the semi-join and the following fact joins
    into broadcasts at runtime without us hardcoding a hint that would
    be wrong if the threshold were loosened.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    big_orders = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey")
    )
    qualifying = o.join(
        big_orders, o.o_orderkey == big_orders.l_orderkey, "left_semi"
    )
    return (
        c.join(qualifying, c.c_custkey == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(30,4)"))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q14 analog: promo revenue ratio — conditional aggregate over a part join
# --------------------------------------------------------------------------

_PROMO_REVENUE_SQL = f"""
SELECT CAST(100.0 AS DOUBLE) * (
         {sql_dec_sum(f"CASE WHEN p.p_type = 'PROMO' THEN {_REVENUE} ELSE 0 END", 6)}
         / {sql_dec_sum(_REVENUE, 6)}
       ) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-02-01'
"""


@query("promo_revenue_ratio", _PROMO_REVENUE_SQL)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-share of one month's revenue.

    Scale posture: the month filter prunes ``lineitem`` at the scan;
    ``part`` is the only dimension and joins on its key (AQE elects a
    broadcast when it fits; at 100 TB ``part`` scales with SF so we
    don't hardcode the hint). The two sums share one aggregate — a
    single scan, a single shuffle-free final reduction to one row.
    Division happens once on the exact decimal-summed doubles, so both
    engines compute the identical IEEE quotient.
    """
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = _revenue_col()
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * (dec_sum(promo_rev, 6) / dec_sum(rev, 6))
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Q22 analog: idle high-balance customers — global scalar threshold + anti-join
# --------------------------------------------------------------------------

_IDLE_CUSTOMER_SQL = f"""
WITH threshold AS (
  SELECT {sql_dec_sum('c_acctbal')} / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       {sql_dec_sum('c_acctbal')} AS total_bal
FROM customer c, threshold t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@query("idle_customer_balances", _IDLE_CUSTOMER_SQL)
def idle_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers whose balance beats the positive-balance
    average but who placed no recent order — a global scalar subquery
    feeding a filter, composed with an anti-join, grouped per nation.

    Scale posture: the threshold is a 1-row aggregate broadcast into the
    customer scan's filter (never a correlated per-row subquery); the
    anti-join's probe side is pre-filtered to recent orders at the scan
    and joins hash-wise on o_custkey (AQE broadcasts it when the recent
    window is small). The exact decimal-summed average makes the
    threshold — and therefore the qualifying SET, not just the sums —
    bit-identical across engines, so the anti-join row membership is
    deterministic."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    threshold = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((dec_sum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal"))
    )
    rich = c.crossJoin(F.broadcast(threshold)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_custs"),
            dec_sum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Q4 analog: late-shipment priority check — correlated EXISTS over the facts
# --------------------------------------------------------------------------

_PRIORITY_CHECK_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
  AND o.o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("late_shipment_priority", _PRIORITY_CHECK_SQL)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders of one quarter having at least one
    late-shipping lineitem (shipped >60 days after order), counted per
    priority — the correlated-EXISTS pattern.

    Scale posture: the EXISTS decorrelates to a LEFT SEMI join on
    l_orderkey (each order tested once, no fan-out by matching
    lineitems); the correlated date comparison rides the semi-join as
    its residual condition, and the quarter filter prunes orders at the
    scan before the shuffle. The per-priority rollup is a 5-row
    map-side partial aggregate."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    # full-precision interval add: date_add would truncate the order
    # TIMESTAMP to DATE and move the lateness threshold to midnight,
    # diverging from the oracle for any order with a time-of-day part
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q6 analog: forecast revenue change — pure filter + single aggregate
# --------------------------------------------------------------------------

_FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE)
         AS potential_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("forecast_revenue_change", _FORECAST_REVENUE_SQL)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the all-filter single-aggregate scan — the purest
    measure of predicate pushdown + vectorized scan + map-side
    reduction. Every predicate reaches the parquet reader; the result
    is one row, so the only exchange moves a handful of partial sums."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("potential_revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
    )
