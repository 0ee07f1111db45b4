"""Empirical validation of the ASOF-join rewrite at a size where plan
shape decides survival: 2M left rows ASOF-joining 2M right rows over
100k equality keys through ``_apply_asof_join``'s union + carry-window
SQL — the r9 rewrite whose lateral alternative measurably degenerated
into a BroadcastNestedLoopJoin domain join (O(|left| x |right|)).

Gated behind ``CDR_ASOF_SCALE=1`` (~1-2 min). Ground truth is computed
driver-side from the SAME counter-based splitmix64 streams the
executors generate (no collect of the 4M-row corpus): a composite
key*T_RANGE + t sort + searchsorted gives every left row's asof match,
including the greatest-struct tie rule (rid is the struct's first
field, so the max rid wins among equal (k, t) — the sort order's last
element). Numbers recorded in SCALE.md §ASOF-at-2Mx2M.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pytest

N_LEFT = 2_000_000
N_RIGHT = 2_000_000
N_KEYS = 100_000
T_RANGE = 1 << 40
SALT_L, SALT_R = 0x51ED, 0xA55A


def _splitmix(x: np.ndarray) -> np.ndarray:
    m = np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & m
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & m
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & m
    return z ^ (z >> np.uint64(31))


def _kt(ids: np.ndarray, salt: int) -> tuple[np.ndarray, np.ndarray]:
    """Counter-based (key, t) pair per id — identical bytes in executors
    and on the driver, independent of partitioning."""
    k = _splitmix(ids * np.uint64(2) + np.uint64(salt)) % np.uint64(N_KEYS)
    t = _splitmix(ids * np.uint64(2) + np.uint64(1 + salt)) % np.uint64(T_RANGE)
    return k.astype(np.int64), t.astype(np.int64)


@pytest.mark.skipif(
    os.environ.get("CDR_ASOF_SCALE") != "1",
    reason="~1-2 min: 2Mx2M ASOF rewrite validation; set CDR_ASOF_SCALE=1",
)
def test_asof_rewrite_at_2m(spark):
    import pandas as pd

    from clickhouse_data_rebalance_spark.plans.ch_dialect import (
        _apply_asof_join,
        translate,
    )

    def gen(salt, idcol):
        def fn(it):
            for pdf in it:
                ids = pdf["id"].to_numpy(np.uint64)
                k, t = _kt(ids, salt)
                yield pd.DataFrame(
                    {idcol: ids.astype(np.int64), "k": k, "t": t}
                )

        return fn

    spark.range(N_LEFT, numPartitions=32).mapInPandas(
        gen(SALT_L, "lid"), "lid long, k long, t long"
    ).createOrReplaceTempView("asof_sc_l")
    spark.range(N_RIGHT, numPartitions=32).mapInPandas(
        gen(SALT_R, "rid"), "rid long, k long, t long"
    ).createOrReplaceTempView("asof_sc_r")

    q = (
        "SELECT count(*) AS n_left, count(r.rid) AS n_matched, "
        "sum(r.rid) AS rid_sum "
        "FROM asof_sc_l l ASOF LEFT JOIN asof_sc_r r "
        "ON l.k = r.k AND l.t >= r.t"
    )
    df = spark.sql(translate(_apply_asof_join(spark, q)))
    t0 = time.perf_counter()
    row = df.collect()[0]
    wall = time.perf_counter() - t0
    # the whole point of the union+window form: no nested-loop domain
    # join may appear at ANY size
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "broadcastnestedloopjoin" not in plan
    assert "cartesianproduct" not in plan

    # driver-side ground truth from the same counter streams
    lk, lt = _kt(np.arange(N_LEFT, dtype=np.uint64), SALT_L)
    rk, rt = _kt(np.arange(N_RIGHT, dtype=np.uint64), SALT_R)
    rid = np.arange(N_RIGHT, dtype=np.int64)
    c_r = rk * T_RANGE + rt
    order = np.lexsort((rid, c_r))  # (composite, rid) ascending
    c_sorted, rid_sorted = c_r[order], rid[order]
    c_l = lk * T_RANGE + lt
    idx = np.searchsorted(c_sorted, c_l, side="right") - 1
    valid = (idx >= 0) & ((c_sorted[np.maximum(idx, 0)] // T_RANGE) == lk)
    n_matched = int(valid.sum())
    rid_sum = int(rid_sorted[idx[valid]].sum())

    assert row["n_left"] == N_LEFT
    assert row["n_matched"] == n_matched
    assert row["rid_sum"] == rid_sum
    print(
        f"\nASOF 2Mx2M over {N_KEYS} keys: {wall:.1f}s, "
        f"matched {n_matched}/{N_LEFT}, rid_sum {rid_sum}"
    )
