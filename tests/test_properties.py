"""Property-based spot checks (SURVEY.md §5.2 item 6, hypothesis):
engine expressions vs pure-Python models on generated inputs, and
rebalance content preservation on generated tables.

Each property batches all generated rows into ONE DataFrame per example
so the Spark-job count stays low (examples are capped; deadline off —
Spark latency is not the property under test).
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from clickhouse_data_rebalance_spark.functions.text import fingerprint, shingles, tokens
from clickhouse_data_rebalance_spark.plans.rebalance import rebalance, shard_id

WORD = st.text(alphabet="abcdefghij", min_size=1, max_size=6)
TEXTS = st.lists(
    st.lists(WORD, min_size=0, max_size=12).map(" ".join), min_size=1, max_size=20
)

_SETTINGS = dict(max_examples=8, deadline=None)


def _py_shingles(text: str, k: int = 3) -> list[str]:
    ws = text.strip().split() if text.strip() else []
    if len(ws) < k:
        return []
    return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]


@settings(**_SETTINGS)
@given(TEXTS)
def test_shingles_match_python_model(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [r["sh"] for r in df.select(shingles(F.col("text")).alias("sh")).collect()]
    assert got == [_py_shingles(t) for t in texts]


@settings(**_SETTINGS)
@given(TEXTS)
def test_fingerprint_matches_md5_of_normalized(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [r["fp"] for r in df.select(fingerprint("text").alias("fp")).collect()]
    want = [hashlib.md5(t.strip().lower().encode()).hexdigest() for t in texts]
    assert got == want


@settings(**_SETTINGS)
@given(TEXTS)
def test_token_count_matches_split(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [r["n"] for r in df.select(F.size(tokens("text")).alias("n")).collect()]
    want = [len(t.strip().split()) if t.strip() else 1 for t in texts]
    # split of all-whitespace yields [""] (size 1) in both engines' semantics
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(-1000, 1000) | st.none(), st.floats(-1e6, 1e6)),
        min_size=1,
        max_size=200,
    ),
    st.integers(2, 8),
)
def test_rebalance_preserves_content_on_random_tables(spark, tmp_path_factory, rows, n):
    df = spark.createDataFrame(rows, "k INT, v DOUBLE")
    dst = str(tmp_path_factory.mktemp("prop") / "out")
    rebalance(df, n, ["k"], dst_path=dst)
    back = spark.read.parquet(dst)
    pre = df.agg(F.count(F.lit(1)), F.sum("v"), F.sum("k")).collect()[0]
    post = back.agg(F.count(F.lit(1)), F.sum("v"), F.sum("k")).collect()[0]
    assert pre[0] == post[0]
    for a, b in zip(pre[1:], post[1:]):
        assert a == b or abs(a - b) < 1e-6 * max(1.0, abs(a))


@settings(**_SETTINGS)
@given(st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=300), st.integers(2, 16))
def test_shard_id_in_range_and_deterministic(spark, keys, n):
    df = spark.createDataFrame([(k,) for k in keys], "k INT")
    out = df.select(shard_id(n, "k").alias("s"), "k").collect()
    assert all(0 <= r["s"] < n for r in out)
    # same key → same shard within one run
    seen: dict[int, int] = {}
    for r in out:
        assert seen.setdefault(r["k"], r["s"]) == r["s"]
