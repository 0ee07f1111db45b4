"""Local mirror of the driver's t2 differential check (SURVEY.md §5.2):
run a registered Spark query and its DuckDB oracle twin on the same
parquet tables, compare row-count + column names + order-insensitive
values.

Values are compared exactly by default — the engine's queries are
engineered (decimal-sum trick, IEEE-deterministic division) so both
engines produce bit-identical results; a per-call tolerance is available
for the few approximate ops.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _key_one(x):
    """Canonical per-value sort key: numerics sort as float so an int 1
    from one engine and a 1.0 from the other land in the SAME position
    (str-sorting put '1' and '1.0' apart and could zip equal multisets
    row-misaligned); everything else sorts by str."""
    if x is None:
        return (2, "", 0.0)
    if not isinstance(x, bool) and isinstance(x, (int, float)):
        return (0, "", float(x))
    return (1, str(x), 0.0)


def _sort_key(row):
    return tuple(_key_one(x) for x in row)


def compare(spark_df, con, sql: str, float_tol: float = 0.0) -> None:
    """Assert spark_df ≡ duckdb(sql): count, column names, sorted values."""
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row-count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    # driver sorts columns by name before hashing → do the same
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_sorted = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in spark_rows), key=_sort_key
    )
    d_sorted = sorted(
        (tuple(_norm(r[i]) for i in d_idx) for r in duck_rows), key=_sort_key
    )

    mismatches = []
    for rn, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for cn, (sv, dv) in enumerate(zip(sr, dr)):
            if sv == dv:
                continue
            if (
                float_tol
                and isinstance(sv, float)
                and isinstance(dv, float)
                and math.isclose(sv, dv, rel_tol=float_tol, abs_tol=float_tol)
            ):
                continue
            mismatches.append((rn, sorted(spark_cols)[cn], sv, dv))
            if len(mismatches) >= 5:
                break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"value mismatches (row, col, spark, duck): {mismatches}"
