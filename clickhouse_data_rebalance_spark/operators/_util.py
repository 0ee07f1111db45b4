"""Shared helpers for oracle-exact numeric aggregation.

Float summation order differs between Spark (parallel partial aggs) and
DuckDB (single-threaded here), so ``sum(double)`` is not bit-reproducible.
Fix: cast addends to DECIMAL, sum exactly, cast the exact result back to
double — both engines then produce the identical IEEE value and the
driver's value-hash matches (SURVEY.md §7.3 item 1).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec_sum(col: Column | str, scale: int = 4, precision: int = 30) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = 4, precision: int = 30) -> Column:
    """Exact-sum-based average (sum::double / count) — IEEE-deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale, precision) / F.count(F.lit(1))


def sql_dec_sum(expr: str, scale: int = 4, precision: int = 30) -> str:
    """DuckDB twin of :func:`dec_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def sql_dec_avg(expr: str, scale: int = 4, precision: int = 30) -> str:
    return f"({sql_dec_sum(expr, scale, precision)} / COUNT(*))"
