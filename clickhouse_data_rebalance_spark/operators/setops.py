"""Set operations (SURVEY.md §2 C21–C22): union / union all,
intersect / except and their _all variants.

Reference parity: the only set-op in the reference is the *implicit*
union-all a ClickHouse Distributed read performs over shard-local tables
(SURVEY.md B1, sharding_recreation.py:159-160) — `union_all_shards`
reproduces exactly that shape: N disjoint slices unioned back together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import table


@query(
    "union_all_shards",
    """
    SELECT * FROM (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 1
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 2
    ) ORDER BY o_orderkey
    """,
)
def union_all_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    # B1: distributed fan-in read = union-all over shard slices.
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    shards = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    out = shards[0]
    for s in shards[1:]:
        out = out.unionByName(s)
    return out.orderBy("o_orderkey")


@query(
    "union_distinct",
    """
    SELECT nk FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION
      SELECT s_nationkey AS nk FROM supplier
    ) ORDER BY nk
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).distinct().orderBy("nk")


@query(
    "intersect_keys",
    """
    SELECT nk FROM (
      SELECT c_nationkey AS nk FROM customer
      INTERSECT
      SELECT s_nationkey AS nk FROM supplier
    ) ORDER BY nk
    """,
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s).orderBy("nk")


@query(
    "except_keys",
    """
    SELECT nk FROM (
      SELECT c_nationkey AS nk FROM customer
      EXCEPT
      SELECT s_nationkey AS nk FROM supplier
    ) ORDER BY nk
    """,
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s).orderBy("nk")  # subtract == SQL EXCEPT (distinct)


@query(
    "intersect_all_rows",
    """
    SELECT st FROM (
      SELECT o_orderstatus AS st FROM orders WHERE o_totalprice > 100000
      INTERSECT ALL
      SELECT o_orderstatus AS st FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ) ORDER BY st
    """,
)
def intersect_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_orderstatus").alias("st"))
    b = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        F.col("o_orderstatus").alias("st")
    )
    return a.intersectAll(b).orderBy("st")


@query(
    "except_all_rows",
    """
    SELECT st FROM (
      SELECT o_orderstatus AS st FROM orders WHERE o_totalprice > 100000
      EXCEPT ALL
      SELECT o_orderstatus AS st FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ) ORDER BY st
    """,
)
def except_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_orderstatus").alias("st"))
    b = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        F.col("o_orderstatus").alias("st")
    )
    return a.exceptAll(b).orderBy("st")
