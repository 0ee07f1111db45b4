"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``clickhouse_data_rebalance_spark/``; every
operator module registers its builders (and DuckDB oracle twins) into
``registry.QUERIES`` / ``registry.ORACLES`` at import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_data_rebalance_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    registry.load_all()
    return registry.QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered: the first 50 names (registry.DRIVER_ORDER) are a curated
    cover of every §2 component, each with a full SQL oracle — so a
    budget-capped correctness pass still verifies the whole surface."""
    registry.load_all()
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-SQL twin per query; omitted keys get rows-only checks."""
    registry.load_all()
    return registry.ordered_oracles()
