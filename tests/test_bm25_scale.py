"""Empirical check of the BM25 build/probe split at a size where the
bucket pruning matters (~200k synthetic docs): the persisted
inverted-index path must return EXACTLY the one-pass path's top-k, and
the probe must touch only a small fraction of the postings.

Gated behind ``CDR_BM25_SCALE=1`` (~2-3 min). The corpus is generated
counter-style from splitmix64 (same determinism discipline as
tests/test_ivf_scale.py): a 32-word vocabulary with one rare term
('dup', ~1/1009 positions) so idf spread is realistic.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

N_DOCS, DOC_LEN = 200_000, 50
_VOCAB = [
    "dup", "merge", "scan", "key", "agg", "row", "slow", "fast", "table",
    "value", "part", "hash", "batch", "window", "spark", "order", "data",
    "column", "join", "small", "line", "customer", "query", "a", "the",
    "big", "stream", "filter", "sort", "group", "vector", "dedup",
]


def _splitmix(x: np.ndarray) -> np.ndarray:
    m = np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & m
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & m
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & m
    return z ^ (z >> np.uint64(31))


def _doc_texts(ids: np.ndarray) -> list:
    """Deterministic texts for these doc ids: common words by hash mod,
    the rare term only at ~1/1009 token positions."""
    base = ids.astype(np.uint64)[:, None] * np.uint64(DOC_LEN) + np.arange(
        DOC_LEN, dtype=np.uint64
    )
    h = _splitmix(base)
    idx = (h % np.uint64(len(_VOCAB) - 1) + np.uint64(1)).astype(int)  # never 'dup'
    rare = (h % np.uint64(1009)) == 0
    idx[rare] = 0  # 'dup'
    vocab = np.array(_VOCAB)
    return [" ".join(row) for row in vocab[idx]]


@pytest.mark.skipif(
    os.environ.get("CDR_BM25_SCALE") != "1",
    reason="~2-3 min: 200k-doc inverted-index vs one-pass BM25; set CDR_BM25_SCALE=1",
)
def test_bm25_inverted_equals_onepass_at_200k(spark, tmp_path):
    from clickhouse_data_rebalance_spark.operators.llm_text import (
        BM25_TERMS,
        _bm25_index_for,
        bm25_inverted_topk,
        bm25_topk,
    )

    corpus_dir = str(tmp_path / "corpus")

    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame({"doc_id": ids, "text": _doc_texts(ids)})

    (
        spark.range(N_DOCS)
        .repartition(32)
        .mapInPandas(gen, "doc_id long, text string")
        .write.mode("overwrite")
        .parquet(os.path.join(corpus_dir, "documents.parquet"))
    )
    # the fixture loader registers the whole table set — satisfy it by
    # linking the small-SF siblings next to the synthetic documents
    for name in os.listdir("/root/testdata/sf0.001"):
        dst = os.path.join(corpus_dir, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join("/root/testdata/sf0.001", name), dst)

    one_pass = [tuple(r) for r in bm25_topk(spark, corpus_dir).collect()]
    indexed = [tuple(r) for r in bm25_inverted_topk(spark, corpus_dir).collect()]
    assert one_pass == indexed, (one_pass[:3], indexed[:3])
    assert len(indexed) == 10 and indexed[0][2] > 0

    # probe economy: the matching postings are a small fraction of the
    # index (the rare term dominates candidate count vs corpus tokens)
    idx = _bm25_index_for(spark, corpus_dir)
    postings = spark.read.parquet(os.path.join(idx, "postings"))
    total = postings.count()
    matching = postings.filter(F.col("word").isin(list(BM25_TERMS))).count()
    assert matching / total < 0.2, (matching, total)
