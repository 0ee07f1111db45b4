#!/usr/bin/env python
"""Phase-level profile of `rebalance_pipeline` (VERDICT r6 #3: ~2.2x its
r2-best raw time, drifting up two rounds — find the hot phase or
exonerate the number as box variance).

Phases timed per repetition (min of N reported):
  seed      saveAsTable of orders under a fresh location (fixture setup,
            NOT part of the reference pipeline itself)
  count0    rows_before count
  catalog   rename-aside + target clear + CREATE (metadata + FS ops)
  scatter   rebalance() hash shuffle + insertInto append (phase 7 — the
            one real query)
  count1    rows_after count
  gc        drop_versions
  agg       the verification aggregate the registered query returns
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_data_rebalance_spark import registry  # noqa: E402
from clickhouse_data_rebalance_spark.session import get_spark  # noqa: E402
from clickhouse_data_rebalance_spark.tables import load_tables, table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "3"))
    registry.load_all()
    from clickhouse_data_rebalance_spark.plans import catalog as cat
    from clickhouse_data_rebalance_spark.plans.pipeline import (
        _delete_path,
        _ensure_dir,
    )
    from clickhouse_data_rebalance_spark.plans.rebalance import rebalance
    from clickhouse_data_rebalance_spark.plans.rebalance_queries import (
        N_SHARDS,
        _fresh_run_dir,
        dec_sum,
    )
    from pyspark.sql import functions as F

    spark = get_spark("profile-pipeline")
    for df in load_tables(spark, sf_dir).values():
        df.count()

    best: dict[str, float] = {}

    def clock(phase: str, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best[phase] = min(best.get(phase, float("inf")), dt)
        return out

    t_whole = float("inf")
    for _ in range(reps):
        table(spark, sf_dir, "orders")
        for t in ["cdr_pipe_orders", "cdr_pipe_orders__old"]:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = _fresh_run_dir("pipeline_profile")
        w0 = time.perf_counter()
        clock(
            "seed",
            lambda: spark.table("orders")
            .write.option("path", os.path.join(loc, "cdr_pipe_orders_seed"))
            .saveAsTable("cdr_pipe_orders"),
        )
        src = spark.table("cdr_pipe_orders")
        rows_before = clock("count0", src.count)
        schema_ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields
        )
        target_loc = f"{loc.rstrip('/')}/cdr_pipe_orders"

        def catalog_phase():
            spark.sql(
                "ALTER TABLE cdr_pipe_orders RENAME TO cdr_pipe_orders__old"
            )
            _delete_path(spark, target_loc)
            _ensure_dir(spark, target_loc)
            spark.sql(
                f"""CREATE TABLE IF NOT EXISTS cdr_pipe_orders ({schema_ddl})
                    USING parquet LOCATION '{target_loc}'"""
            )

        clock("catalog", catalog_phase)
        clock(
            "scatter",
            lambda: rebalance(
                spark.table("cdr_pipe_orders__old"), N_SHARDS, ["o_orderkey"]
            ).write.insertInto("cdr_pipe_orders"),
        )
        rows_after = clock("count1", spark.table("cdr_pipe_orders").count)
        assert rows_after == rows_before
        clock("gc", lambda: cat.drop_versions(spark, "cdr_pipe_orders"))
        clock(
            "agg",
            lambda: spark.table("cdr_pipe_orders")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                dec_sum("o_totalprice").alias("sum_price"),
                F.countDistinct("o_custkey").alias("n_custs"),
            )
            .collect(),
        )
        t_whole = min(t_whole, time.perf_counter() - w0)

    # registered-query end-to-end, same session, for cross-checking
    q = registry.QUERIES["rebalance_pipeline"]
    t_reg = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        q(spark, sf_dir).collect()
        t_reg = min(t_reg, time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "phases_min_sec": {k: round(v, 3) for k, v in best.items()},
                "phases_total": round(sum(best.values()), 3),
                "whole_min_sec": round(t_whole, 3),
                "registered_query_min_sec": round(t_reg, 3),
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
