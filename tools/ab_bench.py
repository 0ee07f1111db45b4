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
       python tools/ab_bench.py --norm A.json B.json
           hardware-normalized comparison of two bench JSON files
           (bench.py output or this tool's): per-query and total
           (sec/cal_A)/(sec/cal_B) ratios. Files lacking cal_spin_sec
           (rounds before r5) can only be compared raw — the tool
           says so rather than printing a pseudo-normalized number.
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
    from bench import _cpu_calibration

    print(json.dumps({"mode": mode, "total": round(sum(timings.values()), 3),
                      "queries": timings, "cal_spin_sec": _cpu_calibration()}))
    spark.stop()


def norm_compare(path_a: str, path_b: str) -> None:
    """Print per-query and total cal-normalized ratios A vs B."""
    def load(p):
        with open(p) as f:
            d = json.load(f)
        # driver-recorded BENCH_r*.json wraps bench output under "parsed"
        return d["parsed"] if isinstance(d.get("parsed"), dict) else d

    a, b = load(path_a), load(path_b)
    qa, qb = a.get("queries", {}), b.get("queries", {})
    ca, cb = a.get("cal_spin_sec"), b.get("cal_spin_sec")
    shared = [q for q in qa if qb.get(q)]
    raw_a = sum(qa[q] for q in shared)
    raw_b = sum(qb[q] for q in shared)
    out = {
        "a": path_a,
        "b": path_b,
        "shared_queries": len(shared),
        "raw_total_ratio": round(raw_a / raw_b, 3) if raw_b else None,
    }
    if ca and cb:
        out["cal_a"], out["cal_b"] = ca, cb
        out["box_speed_ratio_a_vs_b"] = round(ca / cb, 3)
        out["cal_total_ratio"] = round((raw_a / ca) / (raw_b / cb), 3)
        out["query_cal_ratios"] = {
            q: round((qa[q] / ca) / (qb[q] / cb), 3) for q in shared
        }
    else:
        out["note"] = (
            "cal_spin_sec missing from "
            + ", ".join(p for p, c in [(path_a, ca), (path_b, cb)] if not c)
            + " — raw ratio only; do not read it as a code-speed delta"
        )
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 3 and sys.argv[1] == "--norm":
        norm_compare(sys.argv[2], sys.argv[3])
        return
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
