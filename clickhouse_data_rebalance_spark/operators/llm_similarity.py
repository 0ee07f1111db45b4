"""Similarity search over the `embeddings` table (SURVEY.md C42–C43 +
training-pipeline ANN): exact top-k cosine (oracle-checked baseline),
threshold similarity join, and LSH-bucketed ANN as the scale path.

Scale design:
- exact top-k against ONE query vector is a map + TakeOrderedAndProject:
  no shuffle of the embedding column, k-sized result — fine at any scale;
- the exact *pairwise* join is restricted to an equi-key (label) so the
  quadratic blowup is per-group, not global;
- the ANN path buckets by random hyperplane signs (deterministic seed
  hashes, no ml-lib randomness), joins bucket-local, then re-ranks
  exactly — the standard LSH recipe, all in DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import table
from ..functions.vectors import cosine, dot, norm

TOP_K = 10
QUERY_VEC_ID = 0


_COSINE_TOPK_ORACLE = f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           list_cosine_similarity(
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(q.qv, x -> CAST(x AS DOUBLE))) AS sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY sim DESC, e.vec_id LIMIT {TOP_K}
"""


@query("cosine_topk_exact", _COSINE_TOPK_ORACLE)
def cosine_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the correctness baseline for ANN (C42)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


_PAIR_SIM_ORACLE = """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
           list_cosine_similarity(
             list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(b.embedding, x -> CAST(x AS DOUBLE))) AS sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(
             list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.8
    ORDER BY id_a, id_b
"""


@query("cosine_pairs_threshold", _PAIR_SIM_ORACLE)
def cosine_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C43: similarity join (same-label pairs with cosine ≥ 0.8). The
    label equi-key keeps the join shuffle-partitioned, not cross."""
    e = table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    sim = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.label").alias("label"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= 0.8)
        .orderBy("id_a", "id_b")
    )


# ---- ANN: sign-of-random-hyperplane LSH, deterministic ---------------------
N_PLANES = 12  # 2^12 buckets


def _hyperplanes_df(spark: SparkSession, dim: int = 64):
    """Deterministic pseudo-random hyperplanes: component j of plane p is
    a hash-derived value in [-1, 1]. Pure SQL expressions — no RNG state."""
    return spark.range(N_PLANES).select(
        F.col("id").alias("plane"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(2000001)) - 1000000)
            / 1000000.0,
        ).alias("pv"),
    )


def _bucket_of(vec_col: F.Column, planes) -> F.Column:
    """LSH bucket id: bit p = sign(vec · plane_p). `planes` is a collected
    broadcastable list of (plane, pv) rows — N_PLANES×dim doubles, tiny."""
    sig = F.lit(0).cast("long")
    for p in planes:
        d = dot(vec_col, F.array(*[F.lit(x) for x in p["pv"]]))
        sig = sig.bitwiseOR(
            F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), int(p["plane"]))).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


@query("ann_lsh_topk")  # approximate → rows-only
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C42 scale path: hyperplane-LSH bucketing → candidate set = query's
    bucket (plus same-bucket re-rank). Emits top-k from the bucket;
    recall checked against the exact baseline in tests."""
    e = table(spark, sf_dir, "embeddings")
    planes = _hyperplanes_df(spark).collect()  # 12×64 doubles — constant metadata
    bucketed = e.select(
        "vec_id", "label", "embedding", _bucket_of(F.col("embedding"), planes).alias("bucket")
    )
    q = bucketed.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", cosine(F.col("embedding"), F.col("qv")).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


@query("embedding_norms", f"""
    SELECT vec_id, label,
           sqrt(list_dot_product(
             list_transform(embedding, x -> CAST(x AS DOUBLE)),
             list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS l2_norm
    FROM embeddings ORDER BY vec_id
""")
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-norm projection — the dot/norm building block, oracle-checked."""
    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", "label", norm(F.col("embedding")).alias("l2_norm")).orderBy(
        "vec_id"
    )
