"""Subqueries & CTEs (SURVEY.md §2 C23–C24): scalar, IN, correlated
EXISTS, WITH. Expressed via spark.sql — Catalyst decorrelates the
correlated forms into joins (check: no per-row re-execution in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import table
from ._util import sql_dec_sum

_SCALAR_SUBQ = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    ORDER BY o_orderkey
"""


@query("scalar_subquery", _SCALAR_SUBQ)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AVG(double) is order-dependent across engines, but only the *filter*
    # uses it: any row within ±1 ulp of the threshold could flip. The
    # generated totalprice values are far from the threshold in practice;
    # exactness is restored by computing the avg through an exact decimal sum.
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
                   / COUNT(*) * 1.5
            FROM orders)
        ORDER BY o_orderkey
        """
    )


# keep the oracle exact too
_SCALAR_SUBQ_ORACLE = f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
        SELECT {sql_dec_sum('o_totalprice')} / COUNT(*) * 1.5 FROM orders)
    ORDER BY o_orderkey
"""
from ..registry import ORACLES  # noqa: E402

ORACLES["scalar_subquery"] = " ".join(_SCALAR_SUBQ_ORACLE.split())


_IN_SUBQ = """
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    ORDER BY c_custkey
"""


@query("in_subquery", _IN_SUBQ)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer")
    table(spark, sf_dir, "nation")
    return spark.sql(_IN_SUBQ)


_EXISTS_SUBQ = """
    SELECT p.p_partkey, p.p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
    ORDER BY p.p_partkey
"""


@query("exists_subquery", _EXISTS_SUBQ)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "part")
    table(spark, sf_dir, "lineitem")
    return spark.sql(_EXISTS_SUBQ)


_CORRELATED_SCALAR = """
    SELECT s.s_suppkey, s.s_name,
           (SELECT COUNT(*) FROM lineitem l WHERE l.l_suppkey = s.s_suppkey) AS n_lines
    FROM supplier s
    ORDER BY s.s_suppkey
"""


@query("correlated_scalar_subquery", _CORRELATED_SCALAR)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "supplier")
    table(spark, sf_dir, "lineitem")
    return spark.sql(_CORRELATED_SCALAR)


_CTE = f"""
    WITH big_orders AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_totalprice > 150000
    ),
    cust_big AS (
        SELECT o_custkey, COUNT(*) AS n_big,
               {sql_dec_sum('o_totalprice')} AS spend
        FROM big_orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, b.n_big, b.spend
    FROM customer c JOIN cust_big b ON c.c_custkey = b.o_custkey
    ORDER BY c.c_custkey
"""


@query("cte_query", _CTE)
def cte_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer")
    table(spark, sf_dir, "orders")
    return spark.sql(_CTE)
