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
from ._util import dec_avg, dec_sum, sql_dec_sum

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


# --------------------------------------------------------------------------
# Q7 analog: volume shipping — bilateral trade between two nations, by the
# supplier-side and customer-side nation and ship year
# --------------------------------------------------------------------------

_VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       {sql_dec_sum(_REVENUE, 6)} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""


@query("volume_shipping_nations", _VOLUME_SHIPPING_SQL)
def volume_shipping_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral-trade revenue between a nation pair by
    ship year — the double-dimension-join query (nation joins BOTH fact
    sides).

    Scale posture: `nation` is 25 rows at any SF — both copies are
    explicit broadcasts, so the disjunctive nation-pair predicate
    evaluates right after each broadcast join with zero shuffle added;
    the ship-date range is pushed to the lineitem scan; the only
    shuffles are the SF-growing equi-joins (lineitem-orders,
    orders-customer) and one small grouped exchange."""
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | (
        (F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18")
    )
    return (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dec_sum(_revenue_col(), 6).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 analog: national market share — one nation's share of a region's
# revenue in one part-type market, by order year
# --------------------------------------------------------------------------

_MARKET_SHARE_SQL = f"""
SELECT o_year,
       ({sql_dec_sum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END", 6)}
        / {sql_dec_sum("volume", 6)}) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         ns.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE r.r_name = 'EUROPE'
    AND p.p_type = 'PROMO'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
) t
GROUP BY o_year
ORDER BY o_year
"""


@query("national_market_share", _MARKET_SHARE_SQL)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a 7-join snowflake with a conditional-over-total
    ratio aggregate (one nation's share of a region+part-type market by
    year).

    Scale posture: `nation` (twice) and `region` are constant-25/5-row
    broadcasts; `part` is filtered on p_type BEFORE its join (pushed to
    the scan) which prunes the lineitem join ~6x; the numerator rides
    the same aggregate as the denominator (one grouped exchange, no
    second pass). Both sums are exact-decimal so the share divides two
    engine-identical doubles."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    nc = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = table(spark, sf_dir, "supplier")
    volume = _revenue_col()
    base = (
        p.join(l, p.p_partkey == l.l_partkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    national = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        base.groupBy("o_year")
        .agg(
            (dec_sum(national, 6) / dec_sum(F.col("volume"), 6)).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q13 analog: customer order-count distribution — outer join + two-level agg
# --------------------------------------------------------------------------

_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("customer_order_distribution", _ORDER_DISTRIBUTION_SQL)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an ON-clause filter (the
    filter must NOT eliminate order-less customers — the classic outer
    join semantics trap) feeding a two-level aggregation (orders per
    customer, then customers per order-count).

    Scale posture: the priority filter sits in the join condition so it
    prunes the orders side pre-join while preserving the outer rows;
    level-1 aggregates on the join key (reuses the join partitioning —
    no extra exchange under AQE); level-2 exchanges only |distinct
    counts| rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q15 analog: top supplier — quarterly revenue view + global-max scalar
# subquery + join back
# --------------------------------------------------------------------------

_TOP_SUPPLIER_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dec_sum(_REVENUE, 6)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@query("top_supplier_revenue", _TOP_SUPPLIER_SQL)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a derived revenue view consumed twice — once for
    the global MAX (scalar subquery) and once joined back to pick the
    winning supplier(s), ties included (which LIMIT 1 would drop).

    Scale posture: the view is one filtered scan + grouped exchange on
    l_suppkey; the MAX is a one-row broadcast back onto the view (no
    second scan of lineitem — the view is cached by reuse in the same
    plan via Spark's subquery reuse, and |suppliers| rows flow onward)."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(_revenue_col(), 6).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(
            F.broadcast(max_rev), F.col("total_revenue") == F.col("m")
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q17 analog: small-quantity-order revenue — correlated per-part average
# --------------------------------------------------------------------------

_SMALL_QTY_SQL = """
SELECT CAST(COALESCE(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
            / 7.0, 0.0) AS DOUBLE) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey, 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                           / COUNT(*)) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
) t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12'
  AND l.l_quantity < t.qty_threshold
"""


@query("small_qty_order_revenue", _SMALL_QTY_SQL)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines whose quantity undercuts 20% of their
    part's average quantity — the correlated-aggregate-as-join pattern
    (the per-part average is computed once as a grouped view and joined
    back, not re-evaluated per row).

    Scale posture: the threshold view aggregates lineitem by l_partkey
    (one grouped exchange, map-side combined); the brand filter prunes
    `part` at its scan and the join to the small filtered part side cuts
    the fact rows before the threshold comparison. The final aggregate
    is a single row. The per-part average uses the exact-decimal sum so
    the threshold double is engine-identical."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    thresh = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * dec_avg(F.col("l_quantity"), 6)).alias("qty_threshold")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(thresh, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.coalesce(
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double")
                / F.lit(7.0),
                F.lit(0.0),
            )
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).cast("bigint").alias("n_small_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q19 analog: discounted revenue — three disjunctive brand/size/quantity
# predicate groups over one part-lineitem join
# --------------------------------------------------------------------------

_DISJUNCTIVE_REVENUE_SQL = f"""
SELECT {sql_dec_sum(_REVENUE, 6)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("disjunctive_predicate_revenue", _DISJUNCTIVE_REVENUE_SQL)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning BOTH join sides — the
    predicate the optimizer must decompose to push anything at all.

    Scale posture: Catalyst extracts the common single-side residues
    (brand IN (...), size/quantity range hulls) and pushes them to the
    part and lineitem scans while the full cross-side disjunction
    evaluates post-join; the part side shrinks to three brands before
    joining. One join, one one-row aggregate — no other exchange."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dec_sum(_revenue_col(), 6).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
