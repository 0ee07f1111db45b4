"""Vector math over ArrayType(FloatType) embedding columns — pure
higher-order `pyspark.sql.functions` (JVM-side, codegen), no UDFs.

Floats are widened to double *before* any arithmetic so results are
bit-identical to DuckDB's `list_dot_product` / `list_cosine_similarity`
(both accumulate left-to-right in double).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: zero-vector → NULL instead of an ANSI DIVIDE_BY_ZERO error
    return F.try_divide(dot(a, b), norm(a) * norm(b))
