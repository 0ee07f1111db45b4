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


_LATERAL_TOPN = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey % 11 = 0
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


@query("join_lateral_topn", _LATERAL_TOPN)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery in FROM (SQL:1999 lateral derived
    table; Spark 3.2+): each customer's two most expensive orders via a
    per-row subquery — the declarative spelling of top-k-per-group
    (C20), which Catalyst DECORRELATES into the same window/join plan
    rather than executing per-row. Identical text runs on DuckDB, so
    the oracle exercises the same construct, not a rewrite.

    Scale: after decorrelation this is a join + per-key rank — no
    nested-loop re-execution per outer row; the modulo filter pushes
    to the customer scan."""
    table(spark, sf_dir, "customer")
    table(spark, sf_dir, "orders")
    return spark.sql(_LATERAL_TOPN)


_RECURSIVE_CHAIN = """
WITH RECURSIVE chain(s_suppkey, depth) AS (
  SELECT s_suppkey, 0 AS depth FROM supplier WHERE s_suppkey = 0
  UNION ALL
  SELECT s.s_suppkey, c.depth + 1
  FROM supplier s
  JOIN chain c
    ON c.s_suppkey = CAST(FLOOR((s.s_suppkey - 1) / 2.0) AS BIGINT)
  WHERE s.s_suppkey > 0
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(MIN(s_suppkey) AS BIGINT) AS min_key,
       CAST(MAX(s_suppkey) AS BIGINT) AS max_key
FROM chain
GROUP BY depth
ORDER BY depth
"""


@query("recursive_cte_chain", _RECURSIVE_CHAIN)
def recursive_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.0+): per-level rollup of a reporting
    hierarchy derived deterministically from the supplier table
    (heap-parent rule: parent(k) = floor((k-1)/2)) — the org-chart /
    BOM traversal SQL shape `dedup_clusters_cc` solves imperatively for
    arbitrary graphs, here in its declarative form. The IDENTICAL
    recursive text runs on DuckDB, so the oracle exercises the same
    construct.

    Scale: each recursion step is one distributed join of the frontier
    against the child scan — depth x join cost, no driver-side loop
    state beyond the frontier DataFrame; the heap rule bounds depth at
    log2(n)."""
    table(spark, sf_dir, "supplier")
    return spark.sql(_RECURSIVE_CHAIN)


_GROUP_BY_ALL = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
FROM lineitem
WHERE l_quantity >= 25
GROUP BY ALL
ORDER BY l_returnflag, l_linestatus
"""


@query("group_by_all", _GROUP_BY_ALL)
def group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` (Spark 3.4+ / DuckDB): the engine infers the
    grouping keys from the non-aggregate select items — identical text
    on both engines, so the oracle exercises the same inference, not a
    rewrite. Same physical plan as the explicit GROUP BY."""
    table(spark, sf_dir, "lineitem")
    return spark.sql(_GROUP_BY_ALL)


@query(
    "identifier_parameterized",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_totalprice > 200000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def identifier_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with the IDENTIFIER() clause (Spark 3.5+): the
    table name and the threshold bind as ARGUMENTS, not string splices —
    the injection-safe Spark-native replacement for the reference's
    f-string query assembly (`sharding_recreation.py:159-160` splices
    `{database}.{table}` into raw SQL, its whole DDL surface is string
    surgery). A hostile "name" like `orders; DROP TABLE x` fails to
    BIND instead of executing.

    Scale: identical plan to the literal query — parameter binding is
    analysis-time only."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM IDENTIFIER(:tbl) WHERE o_totalprice > :thr
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"tbl": "orders", "thr": 200000},
    )


_PIVOT_SQL_CLAUSE = """
SELECT l_returnflag,
       CAST(f AS DOUBLE) AS qty_f,
       CAST(o AS DOUBLE) AS qty_o
FROM (
  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
)
PIVOT (
  SUM(CAST(l_quantity AS DECIMAL(30,4))) FOR l_linestatus IN ('F' AS f, 'O' AS o)
)
ORDER BY l_returnflag
"""

_PIVOT_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,4)))
            FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,4)))
            FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("pivot_sql_clause", _PIVOT_ORACLE)
def pivot_sql_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (`pivot_agg` covers the DataFrame `.pivot`
    API; this is the declarative spelling a SQL-first user writes). The
    oracle derives the same cells via FILTERed conditional aggregates —
    an independent derivation, so a mis-bound pivot column would
    hash-mismatch. Catalyst compiles both to the same single-scan
    conditional-aggregate plan: pivot columns are enumerated at analysis
    time, never a second pass per column."""
    table(spark, sf_dir, "lineitem")
    return spark.sql(_PIVOT_SQL_CLAUSE)
