"""Empirical validation of the hyperplane-LSH scale rule at 1M vectors
(VERDICT r9 #6 — the last rows-only query family gains a quantitative
scale guarantee like IVF's): corpus synthesized with the same
counter-based splitmix64 + Box-Muller mixture as tests/test_ivf_scale.py,
bucketed at ``lsh_params_for(1e6)`` = (16 tables, 8 planes), candidates =
union of the query's 16 buckets, exact cosine re-rank — recall@10 vs the
exact driver-side ground truth and the scanned candidate fraction are
measured, not just the banding arithmetic the fixture-scale property
test pins.

Gated behind ``CDR_LSH_SCALE=1`` (~2-3 min). Numbers recorded in
SCALE.md §LSH-at-1M.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.test_ivf_scale import _synth_block

N_VECTORS = 1_000_000
QUERY_IDS = (0, 31337, 123457, 555555, 999999)


@pytest.mark.skipif(
    os.environ.get("CDR_LSH_SCALE") != "1",
    reason="~2-3 min: 1M-vector LSH recall validation; set CDR_LSH_SCALE=1",
)
def test_lsh_scale_rule_recall_and_candidate_fraction(spark):
    from clickhouse_data_rebalance_spark.operators.llm_similarity import (
        _make_bucket_codes_udf,
        _planes_matrix,
        lsh_params_for,
    )

    n_tables, planes_per_table = lsh_params_for(N_VECTORS)
    # the rule's output at 1M differs from the fixture's (16, 5)
    assert (n_tables, planes_per_table) == (16, 8)

    # --- corpus synthesized in executors (no driver collect), coded by
    # the SAME vectorized pandas UDF the registered query path uses ---
    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            x = _synth_block(ids)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(x)})

    corpus = spark.range(N_VECTORS).repartition(32).mapInPandas(
        gen, "vec_id long, embedding array<float>"
    )
    codes_udf = _make_bucket_codes_udf(n_tables, planes_per_table)
    coded = corpus.select(
        "vec_id",
        "embedding",
        F.posexplode(codes_udf("embedding")).alias("t", "bucket"),
    )

    # --- driver side: identical codes for the query vectors (same
    # planes matrix, same float64 matmul as the UDF) + exact truth ---
    X = _synth_block(np.arange(N_VECTORS, dtype=np.uint64))
    planes = _planes_matrix(
        n_tables=n_tables, planes_per_table=planes_per_table
    )
    weights = 1 << np.arange(planes_per_table, dtype=np.int64)
    probe_rows = []
    for q in QUERY_IDS:
        signs = (X[q].astype(np.float64) @ planes >= 0).astype(np.int64)
        codes = (signs.reshape(n_tables, planes_per_table) * weights).sum(
            axis=1
        )
        probe_rows += [(int(q), int(t), int(b)) for t, b in enumerate(codes)]
    probes = spark.createDataFrame(probe_rows, "q long, t int, bucket long")

    # ONE candidate pass for all queries: broadcast the 80-row probe
    # set, equi-join on (table, bucket) — the same join shape the
    # registered ann_lsh_topk runs per query
    cands = (
        coded.join(F.broadcast(probes), ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("q"))
        .dropDuplicates(["q", "vec_id"])
    )
    qv = spark.createDataFrame(
        [(int(q), [float(v) for v in X[q]]) for q in QUERY_IDS],
        "q long, qv array<float>",
    )
    from clickhouse_data_rebalance_spark.functions.vectors import cosine

    from pyspark.sql import Window

    ranked = (
        cands.join(F.broadcast(qv), "q")
        .select(
            "q",
            "vec_id",
            cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q").orderBy(
                    F.col("sim").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rn") <= 10)
    )
    got = ranked.groupBy("q").agg(
        F.collect_set("vec_id").alias("ids")
    ).collect()
    got_ids = {r["q"]: set(r["ids"]) for r in got}
    n_cands = {
        r["q"]: r["n"]
        for r in cands.groupBy("q").agg(F.count("*").alias("n")).collect()
    }

    recalls, fracs = [], []
    for q in QUERY_IDS:
        sims = X.astype(np.float64) @ X[q].astype(np.float64)
        sims[q] = -2.0
        true10 = set(np.argpartition(sims, -10)[-10:].tolist())
        recalls.append(len(got_ids[q] & true10) / 10.0)
        fracs.append(n_cands[q] / N_VECTORS)

    mean_recall = sum(recalls) / len(recalls)
    mean_frac = sum(fracs) / len(fracs)
    print(
        f"LSH@1M: recalls={recalls} mean={mean_recall:.3f} "
        f"cand_frac={[round(f, 4) for f in fracs]} mean={mean_frac:.4f}"
    )
    # the VERDICT r9 #6 bar: near-exact recall from a few-percent scan
    assert mean_recall >= 0.95, recalls
    assert min(recalls) >= 0.8, recalls
    assert mean_frac <= 0.15, fracs
