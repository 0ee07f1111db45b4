"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 — a local mirror of the driver's t2 gate. Queries without an
oracle get a rows-run smoke check.
"""

from __future__ import annotations

import os

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
        compare(
            df, duck, registry.ORACLES[name],
            float_tol=FLOAT_TOL.get(name, 0.0), name=name,
        )
    else:
        assert df.count() >= 0  # rows-only: runs and yields a stable schema
        assert len(df.columns) > 0


def test_driver_order_covers_components():
    """The first 50 driver-facing queries are the §2 cover: all present,
    unique, fully oracled (a budget-capped correctness pass must never
    spend a slot on a rows-only row), and ordered_queries() leads with
    them while still exposing every registered query."""
    order = registry.DRIVER_ORDER
    assert len(order) == 50
    assert len(set(order)) == 50
    missing = [n for n in order if n not in registry.QUERIES]
    assert not missing, f"DRIVER_ORDER names not registered: {missing}"
    unoracled = [n for n in order if n not in registry.ORACLES]
    assert not unoracled, f"DRIVER_ORDER entries without oracle: {unoracled}"
    oq = registry.ordered_queries()
    assert list(oq)[:50] == order
    assert set(oq) == set(registry.QUERIES)


@pytest.mark.skipif(
    os.environ.get("CDR_SF01_COVER") != "1",
    reason="~3 min: full 50-query driver cover at sf0.1; set CDR_SF01_COVER=1",
)
def test_driver_cover_at_sf01(spark):
    """Scale-up differential: the whole 50-query driver cover PLUS the
    tier-2 head (the newest surface, next in line for driver rows) must
    exact-match their oracles at sf0.1 too (10x the driver's gate
    scale) — proves the engineered float determinism (decimal sums,
    fixed-point outputs) is scale-independent, not tuned to one fixture
    size. Verified green 2026-08-14 (rounds 5 and 6); run explicitly
    before rounds that touch numeric aggregation paths."""
    sf = "/root/testdata/sf0.1"
    con = duck_connection(sf)
    # tier-2 head = everything up to the first long-green rotated-out
    # veteran ("collect_agg") — the whole newest surface, not a fixed
    # index that silently truncates as the list grows
    tier2_head = registry.DRIVER_ORDER_TIER2[
        : registry.DRIVER_ORDER_TIER2.index("collect_agg")
    ]
    names = registry.DRIVER_ORDER + [
        n for n in tier2_head if n in registry.ORACLES
    ]
    try:
        for name in names:
            compare(
                registry.QUERIES[name](spark, sf), con,
                registry.ORACLES[name], name=name,
            )
    finally:
        con.close()


@pytest.mark.skipif(
    os.environ.get("CDR_SF01_FULL") != "1",
    reason="~10 min: EVERY oracled query at sf0.1; set CDR_SF01_FULL=1 "
    "(VERDICT r6 #7 — the cover+tier-2-head gate above is the per-round "
    "default; this tier closes the long tail before numeric-path changes)",
)
def test_full_registry_at_sf01(spark):
    """Scale-up differential over the FULL registry: all oracled queries
    must exact-match DuckDB at sf0.1, so the long tail (round-2
    flagships, per-function suites) is held to the same 10x-scale bar as
    the driver cover — not just sf0.001. Queries without oracles run a
    rows-only smoke at sf0.1."""
    sf = "/root/testdata/sf0.1"
    con = duck_connection(sf)
    failures = []
    try:
        for name in sorted(registry.QUERIES):
            try:
                if name in registry.ORACLES:
                    compare(
                        registry.QUERIES[name](spark, sf),
                        con,
                        registry.ORACLES[name],
                        float_tol=FLOAT_TOL.get(name, 0.0),
                        name=name,
                    )
                else:
                    assert registry.QUERIES[name](spark, sf).count() >= 0
            except Exception as exc:  # noqa: BLE001 — collect all, report once
                failures.append(f"{name}: {exc}")
    finally:
        con.close()
    assert not failures, "sf0.1 mismatches:\n" + "\n".join(failures)
