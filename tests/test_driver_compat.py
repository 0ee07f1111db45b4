"""Driver-canonicalizer compatibility lint (VERDICT r10 #2).

The external driver materializes DuckDB oracle results through pandas,
which silently changes or breaks certain output types:

  - HUGEINT (what DuckDB returns for an uncast SUM over BIGINT) becomes
    float64 in a pandas frame, so a value-identical int64 Spark column
    hash-mismatches (120 vs 120.0) — the mechanism behind every red
    driver row from r8 through r10.
  - LIST / STRUCT / MAP columns crash pandas ``sort_values``
    ("TypeError: unhashable type: 'list'") — the two r10 ERR rows.

This lint makes the class unrepresentable: DuckDB ``DESCRIBE`` over
EVERY registered oracle (plans without executing — cheap), plus the
Spark side of every COVER query (schema construction only, no action).
A query that needs an array result serializes it to a string on both
engines (array_join / array_to_string — see ch_dialect_quantile).
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

from clickhouse_data_rebalance_spark import registry
from .conftest import SF_SMALL
from .oracle_harness import TABLE_NAMES

registry.load_all()

# \[\d*\] catches both variable-size LIST ("DOUBLE[]") and fixed-size
# ARRAY ("DOUBLE[3]") spellings — both become unhashable lists in the
# driver's pandas frame
_BAD_DUCK = re.compile(r"HUGEINT|\[\d*\]|LIST|STRUCT|MAP\(", re.IGNORECASE)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(SF_SMALL, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def test_every_oracle_schema_is_driver_safe(duck):
    """No registered oracle may plan a HUGEINT/LIST/STRUCT/MAP output
    column — those dtypes corrupt (HUGEINT->float64) or crash
    (unhashable list) the driver's pandas canonicalizer."""
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, sql in sorted(registry.ORACLES.items()):
        desc = duck.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(c, typ) for c, typ, *_ in desc if _BAD_DUCK.search(typ)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "driver-unsafe oracle output columns (CAST sums to BIGINT; "
        f"serialize arrays to strings on both engines): {offenders}"
    )


_DUCK_INT = re.compile(
    r"^U?(TINYINT|SMALLINT|INTEGER|BIGINT)$|^U?INT(8|16|32|64|128)$",
    re.IGNORECASE,
)
_DUCK_FLOAT = re.compile(r"^(FLOAT|DOUBLE|REAL)$", re.IGNORECASE)
_SPARK_INT = {"byte", "short", "int", "integer", "long", "bigint", "tinyint", "smallint"}
_SPARK_FLOAT = {"float", "double"}


def _duck_kind(typ: str) -> str:
    if _DUCK_INT.match(typ):
        return "int"
    if _DUCK_FLOAT.match(typ):
        return "float"
    if typ.upper() == "BOOLEAN":
        return "bool"
    return "other"


def _spark_kind(simple: str) -> str:
    if simple in _SPARK_INT:
        return "int"
    if simple in _SPARK_FLOAT:
        return "float"
    if simple == "boolean":
        return "bool"
    return "other"


def test_every_oracle_agrees_with_spark_on_numeric_kind(spark, duck):
    """Per-column numeric-KIND agreement between EVERY registered query's
    Spark schema and its oracle's DuckDB DESCRIBE (VERDICT r13 #1b).

    The r13 red row (`math_funcs.sgn`): DuckDB ``SIGN(double)`` returns
    TINYINT (pandas int8) while Spark ``signum`` returns DOUBLE, so the
    driver's dtype-sensitive canonical hash diverged on bit-identical
    values (-1 vs -1.0). The local harness normalizes ``1 == 1.0``
    (oracle_harness.py), so only a schema-level lint can catch the class
    before the driver does. Kinds compared: integer-family vs
    float-family vs boolean vs other — width differences inside a family
    are canonicalized by the driver (int32/int64 both hash as int64),
    cross-family is the proven failure mechanism.
    """
    offenders: dict[str, list[tuple[str, str, str]]] = {}
    for name, sql in sorted(registry.ORACLES.items()):
        desc = duck.execute(f"DESCRIBE {sql}").fetchall()
        duck_kinds = {c.lower(): _duck_kind(typ) for c, typ, *_ in desc}
        schema = registry.QUERIES[name](spark, SF_SMALL).schema
        bad = []
        for f in schema.fields:
            dk = duck_kinds.get(f.name.lower())
            sk = _spark_kind(f.dataType.simpleString())
            if dk is not None and {dk, sk} not in ({dk}, {"other"}) and dk != sk:
                # only numeric/bool cross-family divergence is a hash
                # hazard; other-vs-other and same-kind are fine, and
                # other-vs-numeric means a string/date column the
                # driver's schema check already guards
                if {dk, sk} <= {"int", "float", "bool"}:
                    bad.append((f.name, sk, dk))
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "numeric-kind divergence between Spark schema and DuckDB oracle "
        "(column, spark_kind, duck_kind) — cast one side so the kinds "
        f"agree: {offenders}"
    )


def test_cover_spark_schemas_are_driver_safe(spark):
    """The Spark side of every cover query must emit only atomic
    columns — complex types cannot survive the driver's pandas
    sort/hash canonicalization either."""
    from pyspark.sql import types as T

    offenders: dict[str, list[tuple[str, str]]] = {}
    for name in registry.DRIVER_ORDER:
        fn = registry.QUERIES[name]
        schema = fn(spark, SF_SMALL).schema
        bad = [
            (f.name, f.dataType.simpleString())
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"cover queries with complex-typed Spark output columns: {offenders}"
    )
