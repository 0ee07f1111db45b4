"""Scan every registered oracle's output schema via DuckDB DESCRIBE and
report driver-canonicalizer-unsafe columns.

The external driver materializes DuckDB oracle results through pandas:
  - HUGEINT (DuckDB's type for SUM(BIGINT)) becomes float64 in pandas,
    so an int64 Spark column hash-mismatches (120 vs 120.0) even when
    values are identical — the r8-r10 red-row mechanism.
  - LIST/STRUCT/MAP columns crash pandas sort_values
    ("TypeError: unhashable type: 'list'") — the two r10 ERR rows.

DESCRIBE plans the query without executing it, so the scan is cheap.
Usage: python tools/oracle_dtype_scan.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# \[\d*\] catches both variable-size LIST ("DOUBLE[]") and fixed-size
# ARRAY ("DOUBLE[3]") spellings
BAD = re.compile(r"HUGEINT|\[\d*\]|LIST|STRUCT|MAP\(", re.IGNORECASE)


def scan(sf_dir: str) -> dict[str, list[tuple[str, str]]]:
    from clickhouse_data_rebalance_spark import registry

    registry.load_all()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, sql in sorted(registry.ORACLES.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # pragma: no cover - describe failure
            offenders[name] = [("<describe-error>", str(exc)[:200])]
            continue
        bad = [(c, typ) for c, typ, *_ in desc if BAD.search(typ)]
        if bad:
            offenders[name] = bad
    return offenders


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    off = scan(sf)
    for name, cols in off.items():
        print(f"{name}: {cols}")
    print(f"-- {len(off)} offending oracles")
