"""Aggregation surface (SURVEY.md §2 C10–C14): multi-key hash agg,
distinct / count-distinct, approx count-distinct, rollup / cube /
grouping sets, HAVING.

All group-bys are partial-aggregated map-side by Spark automatically
(HashAggregate → Exchange → HashAggregate); keys used here (flags,
dates, nationkey) are low-cardinality → tiny shuffles at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import table
from ._util import dec_avg, dec_sum, sql_dec_avg, sql_dec_sum


@query(
    "agg_multikey",
    f"""
    SELECT o_orderstatus, o_orderpriority, EXTRACT(year FROM o_orderdate) AS yr,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_custs,
           {sql_dec_sum('o_totalprice')} AS total_price,
           {sql_dec_avg('o_totalprice')} AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority, EXTRACT(year FROM o_orderdate)
    ORDER BY o_orderstatus, o_orderpriority, yr
    """,
)
def agg_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 multi-key hash agg; the COUNT(DISTINCT) column doubles as the
    C11 count-distinct representative (distinct_rows / count_distinct
    stay registered as the dedicated row-level variants)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            "o_orderstatus",
            "o_orderpriority",
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
            dec_sum("o_totalprice").alias("total_price"),
            dec_avg("o_totalprice").alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority", "yr")
    )


@query(
    "distinct_rows",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@query(
    "count_distinct",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderpriority) AS n_prios,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_orderpriority").alias("n_prios"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "approx_count_distinct",
    """
    SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           true AS approx_orders_ok,
           true AS approx_parts_ok,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12: HLL sketch under test, verified against the exact count —
    sketch estimates differ per engine, so the oracle-checked columns are
    the exact counts plus within-5%-relative-error booleans (the sketch
    runs at rsd=0.01, so 5% is a 5-sigma band). The HLL is still what's
    exercised; the booleans turn its accuracy contract into a
    hash-checkable value."""
    l = table(spark, sf_dir, "lineitem")
    agg = l.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    within = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= 0.05 * F.col(exact)
    )
    return agg.select(
        "n_orders",
        "n_parts",
        within("approx_orders", "n_orders").alias("approx_orders_ok"),
        within("approx_parts", "n_parts").alias("approx_parts_ok"),
        "n_rows",
    )


@query(
    "rollup_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dec_sum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(dec_sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "cube_agg",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           {sql_dec_sum('o_totalprice')} AS total, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(dec_sum("o_totalprice").alias("total"), F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus, {sql_dec_sum('l_extendedprice')} AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


@query(
    "having_filter",
    f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {sql_dec_sum('o_totalprice')} AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12 AND {sql_dec_sum('o_totalprice')} > 500000
    ORDER BY o_custkey
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice").alias("spend"))
        .filter((F.col("n_orders") >= 12) & (F.col("spend") > 500000))
        .orderBy("o_custkey")
    )


@query(
    "agg_stats",
    f"""
    SELECT l_returnflag,
           {sql_dec_sum('l_quantity')} AS sum_qty,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "pivot_agg",
    f"""
    SELECT o_orderpriority,
           COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (o_orderstatus = 'P') AS n_p,
           {sql_dec_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS total_f
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never the implicit distinct-scan
    form — that is a hidden extra job at scale); the oracle is the
    equivalent conditional aggregation."""
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)
            ).alias("tf"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).alias("n_f"),
        F.coalesce("O_n", F.lit(0)).alias("n_o"),
        F.coalesce("P_n", F.lit(0)).alias("n_p"),
        F.col("F_tf").alias("total_f"),
    ).orderBy("o_orderpriority")


@query(
    "minmax_by_agg",
    """
    SELECT o_custkey,
           max_by(o_orderkey, o_totalprice) AS biggest_order,
           min_by(o_orderkey, o_totalprice) AS smallest_order,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 10
    ORDER BY o_custkey
    """,
)
def minmax_by_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax aggregation (min_by/max_by) — ties impossible here:
    o_totalprice is continuous and per-customer distinct in the fixtures."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 10)
        .orderBy("o_custkey")
    )


@query(
    "collect_agg",
    """
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS nation_csv,
           len(list(n_name)) AS n_collected,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-to-array / string_agg (ClickHouse groupArray analog).
    collect_list order is partition-dependent → sort_array makes it
    deterministic. The array itself is serialized to a joined string at
    the query boundary (array-typed output crashes the driver's pandas
    canonicalizer: unhashable list); its length rides along as n_collected
    so the array aggregation is still value-checked."""
    n = table(spark, sf_dir, "nation")
    collected = F.sort_array(F.collect_list("n_name"))
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(collected, "|").alias("nation_csv"),
            F.size(collected).cast("long").alias("n_collected"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "stratified_sample",
    """
    SELECT o_orderstatus, COUNT(*) AS n_sampled,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR) || ':' || o_orderstatus), 1, 1)
          < CASE o_orderstatus WHEN 'F' THEN '4' WHEN 'O' THEN '2' ELSE '8' END
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C33 variant: per-stratum deterministic sampling — a different
    md5-bucket cut per order status (F: 4/16, O: 2/16, P: 8/16), the
    class-balanced-extract pattern. Hash-based (not sampleBy) so the
    selected set is engine- and run-reproducible, and the filter pushes
    into the scan like any predicate."""
    o = table(spark, sf_dir, "orders")
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.col("o_orderkey").cast("string"), F.col("o_orderstatus"))),
        1,
        1,
    )
    cut = (
        F.when(F.col("o_orderstatus") == "F", "4")
        .when(F.col("o_orderstatus") == "O", "2")
        .otherwise("8")
    )
    return (
        o.filter(bucket < cut)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "approx_quantiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75,
           ROUND(quantile_cont(l_quantity, 0.99), 6) AS p99,
           true AS approx_ok,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (percentile_approx, GK sketch) — the
    mergeable-sketch path for percentiles over 100 TB — under test against
    exact per-quantile scalars. Output is one scalar column per quantile
    (array output crashes the driver canonicalizer) of the EXACT
    percentile (cross-engine comparable: R-7 interpolation in both) plus a
    boolean asserting the GK sketch landed within its rank-error bound."""
    l = table(spark, sf_dir, "lineitem")
    qs = [0.25, 0.50, 0.75, 0.99]
    agg = l.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_quantity, {q})"), 6).alias(f"p{int(q * 100)}")
            for q in qs
        ],
        F.percentile_approx("l_quantity", qs, 10000).alias("approx"),
        F.count(F.lit(1)).alias("n"),
    )
    # GK accuracy 10000 on ≤100k-row groups → rank error ≤ n/10000 ranks;
    # quantities are dense integers, so value error ≤ 2 is a safe bound
    ok = F.forall(
        F.zip_with(
            F.col("approx"),
            F.array(*[F.col(f"p{int(q * 100)}") for q in qs]),
            lambda a, e: F.abs(a - e) <= 2.0,
        ),
        lambda x: x,
    )
    return agg.select(
        "l_returnflag",
        *[f"p{int(q * 100)}" for q in qs],
        ok.alias("approx_ok"),
        "n",
    ).orderBy("l_returnflag")


@query(
    "histogram_agg",
    f"""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM orders GROUP BY 1 ORDER BY bin
    """,
)
def histogram_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (ClickHouse histogram analog): binning is a
    map-side projection, the groupBy carries only (bin, partials)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bin")
    )


_STATS_ORACLE = """
    WITH s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,4)) * CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4)) * CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,4)) * CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sxy
      FROM lineitem
    )
    SELECT n,
           ROUND(SQRT((n * sxx - sx * sx) / (n * (n - 1.0))), 6) AS stddev_qty,
           ROUND((n * sxy - sx * sy) / (n * (n - 1.0)), 4) AS covar_qty_price,
           ROUND((n * sxy - sx * sy) /
                 SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS corr_qty_price
    FROM s
"""


@query("stats_agg", _STATS_ORACLE)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev / covariance / correlation from exact decimal moment
    sums — the built-in corr()/stddev() accumulate doubles in partition
    order and are not cross-engine reproducible; the moment formula from
    exact sums is, and it is the same single-pass shape (one partial-agg
    shuffle of 5 numbers)."""
    l = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(30,4)")
    p = F.col("l_extendedprice").cast("decimal(30,4)")
    s = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "n",
        F.round(F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1.0)))), 6).alias("stddev_qty"),
        F.round((n * sxy - sx * sy) / (n * (n - F.lit(1.0))), 4).alias("covar_qty_price"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9
        ).alias("corr_qty_price"),
    )
