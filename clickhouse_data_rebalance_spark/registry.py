"""Query registry: every operator registers a (spark, sf_dir) -> DataFrame
builder plus (when SQL-expressible) its DuckDB oracle twin.

The driver contract (``__spark_entry__.py``) exposes these via
``queries()`` / ``oracle_sql()``. Registration happens at import time of
the operator modules; ``load_all()`` imports them all.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; ``oracle`` is the DuckDB-SQL twin.

    Omit ``oracle`` only for genuinely non-SQL-expressible ops (LSH,
    sampling, streaming state) — the driver then records a weaker
    rows-only check (SURVEY.md §2.0).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


_loaded = False


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    # import for registration side effects
    from .operators import (  # noqa: F401
        aggregates,
        joins,
        relational,
        setops,
        subqueries,
        udfs,
        windows,
    )
    from .functions import scalar_funcs, text, vectors  # noqa: F401
    from .plans import rebalance_queries  # noqa: F401
    from .sources import connectors  # noqa: F401
    from .streaming import batch_windows, stream_ops  # noqa: F401
    from .operators import llm_dedup, llm_similarity, llm_text, multimodal  # noqa: F401
    _loaded = True
