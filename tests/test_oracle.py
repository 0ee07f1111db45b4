"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 — a local mirror of the driver's t2 gate. Queries without an
oracle get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from clickhouse_data_rebalance_spark import registry

from .conftest import SF_SMALL
from .oracle_harness import compare, duck_connection

registry.load_all()

# queries whose floats are only approximately reproducible across engines
FLOAT_TOL: dict[str, float] = {}


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_vs_oracle(name, spark, duck):
    df = registry.QUERIES[name](spark, SF_SMALL)
    if name in registry.ORACLES:
        compare(df, duck, registry.ORACLES[name], float_tol=FLOAT_TOL.get(name, 0.0))
    else:
        assert df.count() >= 0  # rows-only: runs and yields a stable schema
        assert len(df.columns) > 0
