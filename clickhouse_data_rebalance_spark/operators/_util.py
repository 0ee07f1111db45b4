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


def sql_hex_bigint(expr: str, nchars: int) -> str:
    """DuckDB-version-proof hex-string -> BIGINT.

    The compact spelling ``CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)``
    depends on hex-literal string casting, a construct whose support has
    shifted across DuckDB releases — it was the one oracle construct in
    the round-8 driver's single hash-mismatch row that no driver-green
    query exercised (VERDICT r8 #1). This helper folds the hex digits
    with a base-16 polynomial over ``strpos``/``substr`` only — ancient,
    semantics-stable primitives — so the oracle parses identically on
    any DuckDB. ``expr`` must yield lowercase hex (md5 output is);
    ``nchars <= 15`` keeps the value under 2^60, inside BIGINT range.

    The Spark twin stays ``F.conv(F.substring(md5, 1, n), 16, 10)``.
    """
    if nchars > 15:
        raise ValueError("nchars > 15 overflows BIGINT")
    acc = "CAST(0 AS BIGINT)"
    for k in range(1, nchars + 1):
        acc = (
            f"({acc} * 16 + strpos('0123456789abcdef', "
            f"substr({expr}, {k}, 1)) - 1)"
        )
    return acc
