"""Empirical validation of min-label connected components at ~500k
nodes / ~1.3M directed edges (r11 — the cover promotion
`dedup_clusters_cc` rides `connected_components`, whose fixture-scale
checks are a 500-node oracle and a random-graph property test; this
measures the ITERATIVE plan at three orders of magnitude more nodes).

Graph construction is deterministic and gives a known answer without a
driver-side model: 488 components of 1024 nodes each — component r
occupies ids [r*1024, (r+1)*1024), node k's tree parent is k//2 within
the component (a binomial-ish tree of depth log2(1024) = 10, so
propagation needs ~10 of the 20 max_rounds), plus one extra
xxhash64-chosen shortcut edge from every third node (intra-component,
only shrinks distances). The correct label for every node is its
component's min id = (id // 1024) * 1024 — an expression, not a
collected ground truth.

Gated behind ``CDR_CC_SCALE=1`` (~1-2 min). Numbers recorded in
SCALE.md §CC-at-500k.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

COMP = 1024
N_COMPONENTS = 488
N_NODES = COMP * N_COMPONENTS  # 499,712


@pytest.mark.skipif(
    os.environ.get("CDR_CC_SCALE") != "1",
    reason="~1-2 min: 500k-node connected-components validation; "
    "set CDR_CC_SCALE=1",
)
def test_connected_components_at_500k(spark):
    from clickhouse_data_rebalance_spark.operators.llm_dedup import (
        connected_components,
    )

    nodes = spark.range(N_NODES).select(F.col("id").alias("node"))
    base = (
        spark.range(N_NODES)
        .select(
            F.col("id").alias("u"),
            (F.col("id") - (F.col("id") % COMP)).alias("root"),
            (F.col("id") % COMP).alias("k"),
        )
    )
    tree = base.filter(F.col("k") >= 1).select(
        "u", (F.col("root") + (F.col("k") / 2).cast("bigint")).alias("v")
    )
    # shortcut edges: every third node links to a deterministic earlier
    # member of ITS OWN component (pmod keeps the target in [0, k))
    shortcuts = base.filter((F.col("k") >= 2) & (F.col("u") % 3 == 0)).select(
        "u",
        (
            F.col("root") + F.pmod(F.xxhash64("u"), F.col("k"))
        ).alias("v"),
    )
    edges = tree.unionByName(shortcuts)

    t0 = time.time()
    labels = connected_components(nodes, edges)
    wrong = labels.filter(
        F.col("lbl") != (F.col("node") - (F.col("node") % COMP))
    ).count()
    n = labels.count()
    wall = time.time() - t0
    print(
        f"CC@{N_NODES}: {n} nodes labeled in {wall:.1f}s, "
        f"{wrong} mislabeled (components of {COMP}, tree depth "
        f"{COMP.bit_length() - 1})"
    )
    assert n == N_NODES
    assert wrong == 0
    # the run must fit the propagation bound with headroom, or the
    # max_rounds=20 default is too tight for the documented claim
    assert wall < 600
