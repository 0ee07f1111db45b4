#!/usr/bin/env python3
"""Regenerate the COVERAGE.md never-externally-verified ledger: every
registered query with zero green driver rows across all CORRECTNESS_r*.json
artifacts (VERDICT r8 #5). Run from the repo root."""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

from clickhouse_data_rebalance_spark import registry  # noqa: E402

registry.load_all()

green: dict[str, list[str]] = {}
for f in sorted(glob.glob("CORRECTNESS_r*.json")):
    d = json.load(open(f))
    rnd = f.split("_r")[-1].split(".")[0]
    for name, row in d.items():
        if row.get("hash_match"):
            green.setdefault(name, []).append(rnd)

never = sorted(n for n in registry.QUERIES if n not in green)
in_cover = [n for n in never if n in registry.DRIVER_ORDER]
print(f"registered: {len(registry.QUERIES)}  never-green: {len(never)}")
print(f"of which in the current cover (next driver rows): {len(in_cover)}")
for n in never:
    marker = " <- in cover" if n in registry.DRIVER_ORDER else ""
    print(f"  {n}{marker}")
