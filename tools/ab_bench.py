#!/usr/bin/env python
"""A/B harness for the r4 bench inflation (VERDICT r4 task 2).

Runs a fast subset of headline queries with session-level r4 changes
toggled off one at a time, in a fresh process per mode:

  A  baseline (current code)
  B  ship_package disabled
  C  ship_package disabled + nanosAsLong not set
  D  tune_session entirely a no-op

Usage: python tools/ab_bench.py <mode>   (prints one JSON line)
       python tools/ab_bench.py          (spawns all modes, prints table)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUERIES = [
    "pricing_summary",
    "join_inner",
    "join_broadcast_dims",
    "agg_multikey",
    "top_k_per_group",
    "rebalance_invariants",
    "session_window_agg",
    "tf_idf",
]


def run_mode(mode: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from clickhouse_data_rebalance_spark import registry, session

    if mode in ("B", "C", "D"):
        session.ship_package = lambda spark: None
    if mode == "C":
        orig = session.tune_session

        def no_nanos(spark):
            for k, v in [
                ("spark.sql.session.timeZone", "UTC"),
                ("spark.sql.adaptive.enabled", "true"),
            ]:
                try:
                    spark.conf.set(k, v)
                except Exception:
                    pass
            return spark

        session.tune_session = no_nanos
    if mode == "D":
        session.tune_session = lambda spark: spark
    # tables.py imported tune_session by name — repoint its reference too
    from clickhouse_data_rebalance_spark import tables

    tables.tune_session = session.tune_session

    from clickhouse_data_rebalance_spark.session import get_spark
    from clickhouse_data_rebalance_spark.tables import load_tables

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark(f"cdr-ab-{mode}")
    dfs = load_tables(spark, sf_dir)
    for df in dfs.values():
        df.count()
    timings = {}
    for name in QUERIES:
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(json.dumps({"mode": mode, "total": round(sum(timings.values()), 3),
                      "queries": timings}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1:
        run_mode(sys.argv[1])
        return
    results = {}
    for mode in ["A", "B", "C", "D"]:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            capture_output=True, text=True, check=False,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"mode {mode} FAILED:\n{out.stderr[-2000:]}")
            continue
        results[mode] = json.loads(line[-1])
        print(line[-1])
    if "A" in results:
        base = results["A"]["queries"]
        for mode, r in results.items():
            if mode == "A":
                continue
            ratios = {k: round(r["queries"][k] / base[k], 2) for k in base if base[k]}
            print(f"mode {mode} vs A: total {r['total']}/{results['A']['total']} "
                  f"ratios {ratios}")


if __name__ == "__main__":
    main()
