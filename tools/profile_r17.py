#!/usr/bin/env python
"""r17 optimization profiler: per-query build time, execution time,
Spark job count, and formatted plans.

Usage: python tools/profile_r17.py [query ...]
  - no args: all bench HEADLINE queries
  - writes plans to plans/r17/<query>_<tag>.txt (tag via PROFILE_TAG env,
    default 'before')

Timing methodology matches bench.py (build + collect, min of N passes)
but additionally separates build from execute and counts jobs via the
status tracker, so the overhead shape per query is visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_data_rebalance_spark import registry
from clickhouse_data_rebalance_spark.session import get_spark
from clickhouse_data_rebalance_spark.tables import load_tables


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PROFILE_TAG", "before")
    passes = int(os.environ.get("PROFILE_PASSES", "3"))
    registry.load_all()
    import bench

    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark("cdr-profile-r17")
    sc = spark.sparkContext
    dfs = load_tables(spark, sf_dir)
    for df in dfs.values():
        df.count()

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
    )
    os.makedirs(plan_dir, exist_ok=True)

    rows = []
    for name in names:
        fn = registry.QUERIES[name]
        best_total, best_build, best_exec = float("inf"), None, None
        best_noop = float("inf")
        n_jobs = None
        for p in range(passes):
            sc.setJobDescription(f"profile:{name}")
            jobs_before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            # noop sink (guide §1.4): computes every column, skips the
            # pickled collect — separates compute from the collect floor
            sc.setJobDescription(f"profile-noop:{name}")
            t3 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t4 = time.perf_counter()
            best_noop = min(best_noop, t4 - t3)
            if t2 - t0 < best_total:
                best_total = t2 - t0
                best_build, best_exec = t1 - t0, t2 - t1
            if p == passes - 1:
                jobs_after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
                n_jobs = jobs_after - jobs_before
                try:
                    plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
                        sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
                    with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                        f.write(plan)
                    n_exch = plan.count("Exchange")
                    n_py = (
                        plan.count("BatchEvalPython")
                        + plan.count("ArrowEvalPython")
                        + plan.count("MapInPandas")
                        + plan.count("FlatMapGroupsInPandas")
                    )
                except Exception:
                    n_exch = n_py = -1
            sc.setJobDescription(None)
        rows.append(
            {
                "query": name,
                "total": round(best_total, 3),
                "build": round(best_build, 3),
                "exec": round(best_exec, 3),
                "noop": round(best_noop, 3),
                "jobs_last_pass": n_jobs,
                "exchanges": n_exch,
                "python_nodes": n_py,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    total = round(sum(r["total"] for r in rows), 3)
    print(json.dumps({"profile_total": total, "n": len(rows), "tag": tag}))
    out = os.path.join(plan_dir, f"profile_{tag}.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
