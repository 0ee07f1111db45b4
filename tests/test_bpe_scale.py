"""Empirical cost-curve gate for the BPE trainer loop at ~200k docs
(VERDICT r12 #5: `bpe_train_merges` was the last expensive cover query
without a `CDR_*_SCALE` row — the python-model differential proves the
merge LOGIC, this measures the per-round rescan's wall-time and the
working-set shrink at 29x the sf0.1 fixture's token count).

Data is expression-generated (no files, no RNG): 200k docs of 28
tokens — a planted dominant bigram 'aa bb' repeated twice per doc
(so round 1's winner and count are closed-form: ('aa', 'bb'),
2 x NDOCS occurrences) followed by 24 arithmetic-derived filler tokens
over a 97-word vocabulary. Each round drives the EXACT
`bpe_train_merges` path (`bpe_train`, the factored round loop):
map-side-combined pair count -> 1-row TakeOrdered winner -> zero-shuffle
rowwise fold rewrite -> localCheckpoint lineage cut.

Gated behind ``CDR_BPE_SCALE=1`` (~1-2 min). Numbers recorded in
SCALE.md §bpe-trainer-at-200k. The per-round cost model this validates:
each round is one full corpus rescan (pair count) + one rewrite — cost
is K x (scan + narrow fold), K-bounded collects only, so rounds must
stay FLAT as the corpus shrinks slightly, not grow with lineage (the
localCheckpoint's job; a regression here shows up as super-linear
per-round times).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

NDOCS = 200_000
STEPS = 3
FILLERS = 24
TOKENS_PER_DOC = 4 + FILLERS  # 'aa bb aa bb' + fillers


@pytest.mark.skipif(
    os.environ.get("CDR_BPE_SCALE") != "1",
    reason="~2 min: 200k-doc BPE trainer cost-curve gate; set CDR_BPE_SCALE=1",
)
def test_bpe_trainer_cost_curve_at_200k(spark):
    from clickhouse_data_rebalance_spark.operators.llm_corpus import bpe_train

    fillers = F.transform(
        F.sequence(F.lit(0), F.lit(FILLERS - 1)),
        lambda j: F.concat(
            F.lit("w"), (F.col("id") * (2 * j + 3) + j) % 97
        ),
    )
    docs = spark.range(NDOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.array(F.lit("aa"), F.lit("bb"), F.lit("aa"), F.lit("bb")),
            fillers,
        ).alias("t"),
    )

    timings: list[tuple] = []
    rows = bpe_train(spark, docs, STEPS, timings=timings)

    assert len(rows) == STEPS
    # round 1 is closed-form: the planted bigram dominates (2 per doc =
    # 400k occurrences; no filler pair can exceed ~2 * NDOCS / 97 * 24)
    step, a, b, n, after = rows[0]
    assert (step, a, b, n) == (1, "aa", "bb", 2 * NDOCS)
    # both planted pairs merge in every doc: 28 -> 26 tokens
    assert after == NDOCS * (TOKENS_PER_DOC - 2)
    # the working set shrinks monotonically (every round merges the
    # winner's non-overlapping occurrences out of the corpus)
    totals = [r[4] for r in rows]
    assert all(x > y for x, y in zip(totals, totals[1:])), totals
    # per-round wall time stays FLAT (no lineage pile-up): every round
    # within 3x the fastest, and none pathological in absolute terms
    secs = [t[1] for t in timings]
    assert max(secs) < 120, secs
    assert max(secs) <= 3 * min(secs) + 2.0, secs
    print(
        "BPE-200k per-round (step, sec, tokens_after): "
        + "; ".join(f"({s}, {sec:.2f}, {tok})" for s, sec, tok in timings)
    )
