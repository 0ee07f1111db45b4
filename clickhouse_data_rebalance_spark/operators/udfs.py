"""UDF / UDAF / UDTF surface (SURVEY.md C34), demonstrating the full
ladder with the scale rules applied:

- scalar **Pandas UDF** (Arrow-batched, the only acceptable Python scalar
  path at 100 TB) — mirrors a SQL expression so it gets a full oracle;
- **applyInPandas** grouped-map UDAF — per-group pandas, one shuffle on
  the group key;
- **UDTF**-style explode implemented as a built-in generator (explode
  over a computed array) — preferred over a Python UDTF;
- a row-at-a-time Python UDF appears ONLY in tests as an
  anti-pattern check, never in a registered query.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..registry import query
from ..tables import table


# type object, not a DDL string: string parsing needs an active session,
# and this module imports before any session exists
@pandas_udf(DoubleType())
def net_price_pandas(extended: pd.Series, discount: pd.Series) -> pd.Series:
    # vectorized over Arrow batches; numerically identical to the SQL expr
    return extended * (1.0 - discount)


@query(
    "pandas_udf_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            net_price_pandas("l_extendedprice", "l_discount").alias("net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def _weighted_avg(pdf: pd.DataFrame) -> pd.DataFrame:
    # Exact arithmetic so the pandas result is order-independent and
    # matches the decimal-sum SQL twin bit-for-bit: prices quantized to
    # integer 1e-4 units (the same rounding CAST(double AS DECIMAL(30,4))
    # performs — prices are 2-decimal values, far from ties), quantities
    # are integral; the weighted sum is then exact int64 math and the only
    # float ops are the final (identical either side) divisions.
    import numpy as np

    p4 = np.rint(pdf["l_extendedprice"].to_numpy() * 10000.0).astype(np.int64)
    w = np.rint(pdf["l_quantity"].to_numpy()).astype(np.int64)
    num = int((p4 * w).sum())
    wsum = int(w.sum())
    # The weighted average leaves this function as floor(num/wsum) in 1e-4
    # units — a BIGINT. No float is ever emitted, so the result cannot
    # ulp-diverge from the SQL twin under ANY rounding implementation
    # (Python's correctly-rounded round vs DuckDB's scaled multiply-round
    # both disappear from the picture). Driver rows r2/r4 proved a double
    # output here straddles 1-ulp boundaries between engines.
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            # exact int floor division; the twin uses DuckDB integer `//`
            # (truncating — identical to floor here: num, wsum > 0)
            "wavg_price_e4": [num // wsum],
            "qty_total": [wsum],
            "n": [len(pdf)],
        }
    )


@query(
    "grouped_map_udaf",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)
                    * CAST(ROUND(l_quantity) AS BIGINT))
                // SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS wavg_price_e4,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty_total,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def grouped_map_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas UDAF: one shuffle on the group key, per-group pandas.
    Exact integer-unit arithmetic inside the UDAF, and the weighted average
    is emitted as an integer-scaled BIGINT (1e-4 units, floor semantics on
    both sides) — integer outputs cannot ulp-diverge between engines, which
    retires the r2/r4 driver hash-mismatch class for good."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.select("l_returnflag", "l_extendedprice", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(
            _weighted_avg,
            schema="l_returnflag string, wavg_price_e4 long, qty_total long, n long",
        )
        .orderBy("l_returnflag")
    )


@query(
    "udtf_explode_fields",
    """
    SELECT o_orderkey, unnest(['status:' || o_orderstatus,
                               'prio:' || o_orderpriority]) AS tag
    FROM orders WHERE o_orderkey < 200
    ORDER BY o_orderkey, tag
    """,
)
def udtf_explode_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped row expansion using the built-in generator (explode) —
    1 row in, N rows out, no Python in the loop."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.explode(
                F.array(
                    F.concat(F.lit("status:"), "o_orderstatus"),
                    F.concat(F.lit("prio:"), "o_orderpriority"),
                )
            ).alias("tag"),
        )
        .orderBy("o_orderkey", "tag")
    )


_SQL_UDF_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CAST(o_totalprice * 0.9 AS DECIMAL(30,6))) AS DOUBLE)
         AS sum_net,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE o_totalprice * 0.9 > 150000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("sql_udf_inlined", _SQL_UDF_ORACLE)
def sql_udf_inlined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDF (CREATE FUNCTION ... RETURN expr, Spark 4): the
    abstraction rung BELOW pandas UDFs on the cost ladder — Catalyst
    INLINES the function body into the plan, so the filter still pushes
    toward the scan and the whole pipeline stays in codegen; zero
    serialization, unlike any Python rung. The oracle states the
    inlined expression directly, so the comparison proves the UDF is
    pure sugar.

    Scale: indistinguishable from writing the expression inline —
    which is the point; use SQL UDFs for shared business logic and
    reserve Python for what expressions cannot say."""
    table(spark, sf_dir, "orders")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cdr_net_price(p DOUBLE) "
        "RETURNS DOUBLE RETURN p * 0.9"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(SUM(CAST(cdr_net_price(o_totalprice) AS DECIMAL(30,6)))
                    AS DOUBLE) AS sum_net,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE cdr_net_price(o_totalprice) > 150000
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


_PY_UDTF_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
  WHERE doc_id % 25 = 0
),
pos AS (
  SELECT doc_id, w,
         unnest(generate_series(1, len(w) - 1)) AS i
  FROM toks
)
SELECT doc_id,
       CAST(i AS INT) AS pos,
       w[i] || ' ' || w[i + 1] AS bigram
FROM pos
ORDER BY doc_id, pos
"""


@query("python_udtf_bigrams", _PY_UDTF_ORACLE)
def python_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (@udtf, Spark 3.5+): one document row in, one
    row per bigram out, via a generator class invoked with LATERAL —
    completing the C34 ladder's table-function rung (the
    `udtf_explode_fields` twin shows the built-in-generator fast path;
    this shows the API for expansions expressions cannot write).

    Scale: row-at-a-time Python — the SLOW rung, kept off hot paths by
    policy (this query filters to 1/25 of documents); when the
    expansion IS expressible as explode/transform, use that instead
    (see the module docstring's ladder)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):
            # bare split() = whitespace-run split, the Python twin of
            # the oracle's regexp_split_to_array '\s+' (r11 review)
            words = text.strip().split()
            for i in range(len(words) - 1):
                yield i + 1, words[i] + " " + words[i + 1]

    table(spark, sf_dir, "documents")
    spark.udtf.register("cdr_bigrams", Bigrams)
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM documents d, LATERAL cdr_bigrams(d.text) b
        WHERE d.doc_id % 25 = 0
        ORDER BY d.doc_id, b.pos
        """
    )
