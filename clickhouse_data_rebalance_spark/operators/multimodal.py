"""Multimodal columns (SURVEY.md C47 + training-pipeline multimodal):
opaque binary payloads with typed metadata, decode/feature-extract as
Arrow-batched Pandas UDFs over mapInPandas.

The environment has no image/audio codecs, so payloads use a synthetic
binary container format (magic + big-endian dims header + body) — but
the decode step is REAL byte parsing (`_decode_media`: magic validation,
struct.unpack dims, body md5), fully oracle-checked against DuckDB's
independent derivation. Swap the body fingerprint for PIL/ffmpeg feature
extraction in a real deployment; the plumbing (binary column, schema,
partitioning, Arrow batch iteration, UDF signature) is unchanged.
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
    "doc_id bigint, width bigint, height bigint, n_body_bytes bigint, "
    "body_md5 string"
)

# Synthetic media container: 4-byte magic + 4-byte BE width + 4-byte BE
# height + body. A stand-in for a real image header (BMP/PNG-style) that
# keeps the decode step REAL — the UDF validates magic and recovers the
# dimensions by parsing bytes, not by passing columns through.
_MAGIC = b"CDRM"


def _decode_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode/feature-extract over the binary container format above:
    magic check, big-endian dimension parse (struct.unpack), body length
    and md5 fingerprint — every output value is computed FROM THE BYTES.
    A real deployment swaps the body fingerprint for PIL/ffmpeg feature
    extraction; the parsing/validation shape is identical. Raises on a
    bad magic so corrupt payloads fail loudly, not silently.
    """
    import hashlib
    import struct

    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [], "n_body_bytes": [],
               "body_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if not isinstance(payload, (bytes, bytearray)):
                raise NotImplementedError("payload column must be binary")
            if payload[:4] != _MAGIC:
                raise ValueError(f"bad media magic {payload[:4]!r} (doc {doc_id})")
            width = struct.unpack(">I", payload[4:8])[0]
            height = struct.unpack(">I", payload[8:12])[0]
            body = bytes(payload[12:])
            out["doc_id"].append(doc_id)
            out["width"].append(width)
            out["height"].append(height)
            out["n_body_bytes"].append(len(body))
            out["body_md5"].append(hashlib.md5(body).hexdigest())
        yield pd.DataFrame(out)


@query(
    "media_feature_extract",
    """
    SELECT doc_id,
           doc_id % 640 + 16 AS width,
           (doc_id * 7) % 480 + 16 AS height,
           octet_length(encode(text)) AS n_body_bytes,
           md5(text) AS body_md5
    FROM documents ORDER BY doc_id
    """,
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (C34+C47):
    Arrow-batched, per-partition iterator — the real multimodal hot-path
    shape, now with a REAL decode: the payload is a binary container
    (magic + big-endian dims header + body) built JVM-side, and the UDF
    recovers every output by parsing bytes (magic validation,
    struct.unpack dims, body md5). The oracle derives the same values
    independently (dims arithmetically — they were encoded from doc_id —
    body length/md5 via octet_length/md5), so a parsing bug on either
    side breaks the hash match."""
    d = table(spark, sf_dir, "documents")
    # header ints -> 4-byte big-endian binary via hex round-trip (codegen)
    be4 = lambda c: F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))  # noqa: E731
    media = d.select(
        "doc_id",
        F.concat(
            F.lit(_MAGIC),
            be4(F.col("doc_id") % 640 + 16),
            be4((F.col("doc_id") * 7) % 480 + 16),
            F.encode("text", "UTF-8"),
        ).alias("payload"),
    )
    return media.mapInPandas(_decode_media, schema=_FEATURE_SCHEMA).orderBy("doc_id")
