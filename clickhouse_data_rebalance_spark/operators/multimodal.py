"""Multimodal columns (SURVEY.md C47 + training-pipeline multimodal):
opaque binary payloads with typed metadata, decode/feature-extract as
Arrow-batched Pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake (`_fake_decode`) — the Spark-side
plumbing (binary column, metadata struct schema, partitioning, batch
iteration, UDF signature) is real and is what the operator contract
covers. Swap `_fake_decode` for PIL/ffmpeg in a real deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import table


@query(
    "multimodal_roundtrip",
    """
    SELECT vec_id, label,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS e0
    FROM embeddings
    WHERE label IN (1, 3) AND CAST(embedding[1] AS DOUBLE) > 0
    ORDER BY vec_id
    """,
)
def multimodal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C47: nested columnar (Dremel-style, PAPERS.md) — ArrayType vectors
    queried alongside scalars with pushed-down predicates on both."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.filter(
            F.col("label").isin(1, 3) & (F.element_at("embedding", 1).cast("double") > 0)
        )
        .select(
            "vec_id",
            "label",
            F.size("embedding").cast("bigint").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("e0"),
        )
        .orderBy("vec_id")
    )


@query(
    "binary_payload_metadata",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lang AS media_lang
    FROM documents ORDER BY doc_id
    """,
)
def binary_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column plumbing: payload as `binary` + typed metadata struct.
    The byte length survives the binary round-trip — SQL-checkable."""
    d = table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("lang").alias("media_lang"), F.lit("text/plain").alias("mime")
        ).alias("meta"),
    )
    return media.select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.media_lang").alias("media_lang"),
    ).orderBy("doc_id")


_FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, checksum bigint, feat0 double, feat1 double"
)


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode/feature-extract. A real deployment decodes the binary
    payload (image/audio) here; the container has no codecs, so features
    are a deterministic function of the raw bytes. Raises on non-bytes to
    make the stub boundary explicit.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        if len(payloads) and not isinstance(payloads.iloc[0], (bytes, bytearray)):
            raise NotImplementedError("payload column must be binary")
        n_bytes = payloads.map(len)
        checksum = payloads.map(lambda b: sum(b[:64]) if b else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "checksum": checksum,
                "feat0": checksum / (n_bytes + 1),
                "feat1": n_bytes.astype("float64") % 257,
            }
        )


@query("media_feature_extract")  # Pandas-UDF path → rows-only
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (C34+C47):
    Arrow-batched, per-partition iterator — the real multimodal hot path
    shape. Deterministic fake features (see `_fake_decode`)."""
    d = table(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return media.mapInPandas(_fake_decode, schema=_FEATURE_SCHEMA).orderBy("doc_id")
