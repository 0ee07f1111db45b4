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
    # quantity-weighted average price per returnflag; pure-integer weights
    # keep the float math identical to the SQL twin
    w = pdf["l_quantity"]
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "wavg_price": [float((pdf["l_extendedprice"] * w).sum() / w.sum())],
            "n": [len(pdf)],
        }
    )


@query("grouped_map_udaf")  # pandas float-sum order differs from SQL → rows-only
def grouped_map_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas UDAF: one shuffle on the group key, per-group pandas."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.select("l_returnflag", "l_extendedprice", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(_weighted_avg, schema="l_returnflag string, wavg_price double, n long")
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
