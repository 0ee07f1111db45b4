"""Relational core, batch 1: scan / project / filter / conditional / cast
(SURVEY.md §2 C1–C3, C25, C32–C33) plus the flagship pricing summary.

Every builder is pure DataFrame API — Catalyst pushes the filters and the
column pruning into the parquet scan (verify with
``df.explain("formatted")``: `PushedFilters`, narrow `ReadSchema`).
Reference parity: the reference's only scan is `SELECT * FROM db.t`
(sharding_recreation.py:160) and metadata filters
(sharding_recreation.py:289-298); everything richer is Tier C surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import table
from ._util import dec_avg, dec_sum, sql_dec_avg, sql_dec_sum

# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary (scan + filter + expr + agg + sort)
# --------------------------------------------------------------------------

PRICING_SUMMARY_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dec_sum('l_quantity')} AS sum_qty,
       {sql_dec_sum('l_extendedprice')} AS sum_base_price,
       {sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
       {sql_dec_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       {sql_dec_avg('l_quantity')} AS avg_qty,
       {sql_dec_avg('l_extendedprice')} AS avg_price,
       {sql_dec_avg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("pricing_summary", PRICING_SUMMARY_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price, 6).alias("sum_disc_price"),
            dec_sum(charge, 6).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# C1 + C14 analog of the reference's one real query: full scan, star projection
# (`SELECT * FROM db.t`, sharding_recreation.py:160)
# --------------------------------------------------------------------------


@query(
    "scan_star",
    "SELECT * FROM nation ORDER BY n_nationkey",
)
def scan_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "nation").orderBy("n_nationkey")


# --------------------------------------------------------------------------
# C2 projection + expressions
# --------------------------------------------------------------------------


@query(
    "projection_expr",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_quantity * 2.0 + 1.0 AS qty2,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CASE WHEN l_quantity > 40 THEN 'bulk'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END AS qty_bucket,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def projection_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 projection expressions, incl. the C25 conditional family (CASE
    WHEN / COALESCE / NULLIF) — `case_when` stays registered as the
    dedicated row-level variant."""
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (F.col("l_quantity") * F.lit(2.0) + F.lit(1.0)).alias("qty2"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.when(F.col("l_quantity") > 40, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_bucket"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    ).orderBy("l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# C3 filters: comparison, BETWEEN, IN, LIKE, IS NULL, boolean combos
# --------------------------------------------------------------------------


@query(
    "filter_predicates",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 50000 AND 200000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_custkey IS NOT NULL
      AND (o_orderdate >= TIMESTAMP '1996-01-01' OR o_totalprice > 150000)
    ORDER BY o_orderkey
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice").between(50000, 200000))
        .filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_orderpriority").like("%URGENT%"))
        .filter(F.col("o_custkey").isNotNull())
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            | (F.col("o_totalprice") > 150000)
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# C25 CASE WHEN / conditional
# --------------------------------------------------------------------------


@query(
    "case_when",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'done'
                ELSE 'other' END AS status_name,
           COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'urgent!') AS prio
    FROM orders
    ORDER BY o_orderkey
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "done")
        .otherwise("other")
        .alias("status_name"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("urgent!")).alias(
            "prio"
        ),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# C32 cast / type coercion
# --------------------------------------------------------------------------


@query(
    "cast_coercion",
    """
    SELECT l_orderkey,
           CAST(l_quantity AS INTEGER) AS qty_i,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(l_shipdate AS DATE) AS ship_d,
           CAST(l_linenumber AS DOUBLE) AS line_d
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def cast_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C32 cast ladder. The DECIMAL(18,2) round-trip is the op under test,
    but raw DECIMAL output arrives as Python Decimal from Spark vs float64
    from DuckDB's pandas path and hash-mismatches in the driver's
    canonicalizer — so the decimal value is projected back to DOUBLE on
    both sides (same trick as _util.dec_sum)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_orderkey") <= 100)
        .orderBy("l_orderkey", "l_linenumber")
        .select(
            "l_orderkey",
            F.col("l_quantity").cast("int").alias("qty_i"),
            F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
            F.col("l_orderkey").cast("string").alias("key_str"),
            F.col("l_shipdate").cast("date").alias("ship_d"),
            F.col("l_linenumber").cast("double").alias("line_d"),
        )
    )


# --------------------------------------------------------------------------
# C33 sample — deterministic hash-based sampling: keep a row iff the first
# hex digit of md5(primary key) falls below the cut. Engine-independent
# (md5 is md5 everywhere), reproducible across runs/partitionings, and the
# design a training pipeline actually wants: re-running the extract — or a
# different engine — selects the SAME sample. Seeded `df.sample()` is
# partition-order dependent and cross-engine incomparable.
# --------------------------------------------------------------------------


@query(
    "sample_fraction",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                     || CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0', '1')
    ORDER BY l_orderkey, l_linenumber
    """,
)
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C33: deterministic ~12.5% Bernoulli sample (2 of 16 hex buckets) by
    md5 of the row key — a pure pushed-down filter, no sample operator
    state, identical row set in any engine."""
    l = table(spark, sf_dir, "lineitem")
    bucket = F.substring(
        F.md5(
            F.concat_ws(
                "-",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        1,
    )
    return (
        l.filter(bucket.isin("0", "1"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )
