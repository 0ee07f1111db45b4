"""ClickHouse-SQL dialect shim: translate the common ClickHouse SQL
surface to Spark SQL so existing queries (the kind users of the
reference tool run against their cluster, e.g.
`sharding_recreation.py:145-161`'s INSERT-SELECT shape) execute
verbatim on this engine.

Scope is the high-frequency dialect delta, translated textually:

==================  =========================================
ClickHouse          Spark SQL
==================  =========================================
toUInt*/toInt*      CAST(x AS BIGINT)
toFloat32/64        CAST(x AS DOUBLE)
toString            CAST(x AS STRING)
toDate/toDateTime   to_date(x) / to_timestamp(x)
toStartOfDay/...    date_trunc('day'|'month'|'year', x)
toYYYYMM            date_format(x, 'yyyyMM') as int
countIf             count_if (native)
sumIf/avgIf/...     agg(x) FILTER (WHERE c)
uniq                approx_count_distinct
uniqExact           COUNT(DISTINCT x)
any/anyLast         any_value
arrayJoin           explode
notEmpty/empty      length(x) > 0 / length(x) = 0
modulo              mod
PREWHERE            WHERE (Spark pushes predicates anyway)
FORMAT <fmt> tail   stripped (sinks are explicit in Spark)
==================  =========================================

Constructs with no one-line Spark equivalent raise
:class:`UnsupportedClickHouseSQL` with a pointer to the native operator
in this package (`LIMIT n BY` -> top_k_per_group, `WITH FILL` ->
time_gap_fill, `SAMPLE` -> sample_fraction, `multiIf` -> CASE WHEN).

The single-argument rewrites use non-nested argument matching; deeply
nested calls inside a rewritten function should be pre-flattened (the
translator raises rather than mistranslating when it cannot match).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import load_tables


class UnsupportedClickHouseSQL(ValueError):
    """A ClickHouse construct this shim does not translate, with the
    native operator to use instead."""


# constructs we refuse (instead of silently mistranslating), with the
# package-native replacement the error message points at
_REFUSALS: list[tuple[re.Pattern[str], str]] = [
    (re.compile(r"\bLIMIT\s+\d+\s+BY\b", re.I), "use top_k_per_group (C20)"),
    (re.compile(r"\bWITH\s+FILL\b", re.I), "use time_gap_fill"),
    (re.compile(r"\bSAMPLE\s+[\d.]", re.I), "use sample_fraction (C33)"),
    (re.compile(r"\bmultiIf\s*\(", re.I), "rewrite as CASE WHEN"),
    (re.compile(r"\bON\s+CLUSTER\b", re.I), "cluster DDL is Spark-global (A4)"),
]

# an argument: non-paren/comma text, allowing one level of nested
# parenthesized calls (whose internal commas are fine) — so
# `toUInt32(count(*))` or `uniqExact(lower(x))` match; deeper nesting
# falls through to the residual check, which raises
_ARG = r"([^(),]*(?:\([^()]*\)[^(),]*)*)"

_REWRITES: list[tuple[re.Pattern[str], str]] = [
    # argless count() is ClickHouse-legal; Spark wants count(*)
    (re.compile(r"\bcount\s*\(\s*\)", re.I), "count(*)"),
    # ---- type conversions ----
    (re.compile(rf"\btoU?Int\d+\s*\(\s*{_ARG}\s*\)", re.I), r"CAST(\1 AS BIGINT)"),
    (re.compile(rf"\btoFloat\d+\s*\(\s*{_ARG}\s*\)", re.I), r"CAST(\1 AS DOUBLE)"),
    (re.compile(rf"\btoString\s*\(\s*{_ARG}\s*\)", re.I), r"CAST(\1 AS STRING)"),
    (re.compile(r"\btoDateTime\s*\(", re.I), "to_timestamp("),
    (re.compile(r"\btoDate\s*\(", re.I), "to_date("),
    # ---- date rounding ----
    (
        re.compile(rf"\btoStartOfDay\s*\(\s*{_ARG}\s*\)", re.I),
        r"date_trunc('day', \1)",
    ),
    (
        re.compile(rf"\btoStartOfMonth\s*\(\s*{_ARG}\s*\)", re.I),
        r"CAST(date_trunc('month', \1) AS DATE)",
    ),
    (
        re.compile(rf"\btoStartOfYear\s*\(\s*{_ARG}\s*\)", re.I),
        r"CAST(date_trunc('year', \1) AS DATE)",
    ),
    (
        re.compile(rf"\btoYYYYMM\s*\(\s*{_ARG}\s*\)", re.I),
        r"CAST(date_format(\1, 'yyyyMM') AS BIGINT)",
    ),
    # ---- aggregate combinators ----
    (re.compile(r"\bcountIf\s*\(", re.I), "count_if("),
    (
        re.compile(rf"\b(sum|avg|min|max)If\s*\(\s*{_ARG}\s*,\s*{_ARG}\s*\)", re.I),
        r"\1(\2) FILTER (WHERE \3)",
    ),
    (re.compile(rf"\buniqExact\s*\(\s*{_ARG}\s*\)", re.I), r"COUNT(DISTINCT \1)"),
    (re.compile(r"\buniq(Combined|HLL12)?\s*\(", re.I), "approx_count_distinct("),
    (re.compile(r"\bany(Last)?\s*\(", re.I), "any_value("),
    # ---- misc scalar ----
    (re.compile(r"\barrayJoin\s*\(", re.I), "explode("),
    (re.compile(rf"\bnotEmpty\s*\(\s*{_ARG}\s*\)", re.I), r"(length(\1) > 0)"),
    (re.compile(rf"\bempty\s*\(\s*{_ARG}\s*\)", re.I), r"(length(\1) = 0)"),
    (re.compile(r"\bmodulo\s*\(", re.I), "mod("),
    # ---- clauses ----
    (re.compile(r"\bPREWHERE\b", re.I), "WHERE"),
    (re.compile(r"\bFORMAT\s+\w+\s*;?\s*$", re.I), ""),
]

# any surviving ClickHouse-only name means a rewrite failed to match
# (e.g. nested arguments) — refuse rather than ship wrong SQL
_RESIDUALS = re.compile(
    r"\b(toU?Int\d+|toFloat\d+|toString|toStartOf\w+|toYYYYMM|sumIf|avgIf"
    r"|minIf|maxIf|uniqExact|arrayJoin|notEmpty|multiIf)\s*\(",
    re.I,
)


def translate(ch_sql: str) -> str:
    """Translate a ClickHouse-dialect SQL string to Spark SQL.

    Raises :class:`UnsupportedClickHouseSQL` for constructs with no
    textual equivalent (pointing at the native operator) and for
    rewrites defeated by nested arguments — never silently mistranslates.
    """
    for pat, hint in _REFUSALS:
        if pat.search(ch_sql):
            raise UnsupportedClickHouseSQL(
                f"{pat.pattern!r} has no textual Spark equivalent — {hint}"
            )
    out = ch_sql
    for pat, repl in _REWRITES:
        out = pat.sub(repl, out)
    residual = _RESIDUALS.search(out)
    if residual:
        raise UnsupportedClickHouseSQL(
            f"could not rewrite {residual.group(0)!r} (nested arguments?) — "
            "flatten the call or use the DataFrame API"
        )
    return out


def ch_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run a ClickHouse-dialect query against the test tables: registers
    each table as a temp view, translates, executes Spark-side."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    return spark.sql(translate(sql))


# a genuinely ClickHouse-flavored monthly rollup: PREWHERE, countIf,
# minIf/maxIf, uniqExact, toStartOfMonth, toUInt32, FORMAT tail.
# (min/max If-combinators rather than sumIf so the doubles stay exact
# and order-free on both engines — a float sumIf would need the decimal
# trick and the translator stays semantics-faithful.)
_CH_QUERY = """
    SELECT toStartOfMonth(o_orderdate) AS month,
           countIf(o_totalprice > 150000) AS n_big,
           uniqExact(o_custkey) AS n_custs,
           minIf(o_totalprice, o_orderstatus = 'F') AS min_f,
           maxIf(o_totalprice, o_orderstatus = 'O') AS max_o,
           toUInt32(count()) AS n_rows
    FROM orders
    PREWHERE o_orderkey % 2 = 0
    GROUP BY month
    ORDER BY month
    FORMAT TabSeparated
"""

_CH_ORACLE = """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
           COUNT(DISTINCT o_custkey) AS n_custs,
           MIN(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS min_f,
           MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS max_o,
           COUNT(*) AS n_rows
    FROM orders
    WHERE o_orderkey % 2 = 0
    GROUP BY month
    ORDER BY month
"""


@query("ch_dialect_rollup", _CH_ORACLE)
def ch_dialect_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dialect shim end-to-end: a ClickHouse-flavored monthly rollup
    (PREWHERE / countIf / sumIf / uniqExact / toStartOfMonth / toUInt32 /
    FORMAT tail) translated and executed as Spark SQL — the switch-over
    path for a reference user's existing query file.

    Scale: the translated query is ordinary Spark SQL, so Catalyst
    treats it like any native plan — pushdown, partial aggregation, AQE
    all apply; the modulo PREWHERE lands in the scan as a WHERE."""
    return ch_sql(spark, sf_dir, _CH_QUERY)
