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
    media = _media_payload(d)
    return media.mapInPandas(_decode_media, schema=_FEATURE_SCHEMA).orderBy("doc_id")


def _media_payload(d: DataFrame) -> DataFrame:
    """The synthetic container (magic + BE dims + body) used by every
    media UDF below — built JVM-side in codegen."""
    be4 = lambda c: F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))  # noqa: E731
    return d.select(
        "doc_id",
        F.concat(
            F.lit(_MAGIC),
            be4(F.col("doc_id") % 640 + 16),
            be4((F.col("doc_id") * 7) % 480 + 16),
            F.encode("text", "UTF-8"),
        ).alias("payload"),
    )


def _hex_md5(b: bytes) -> str:
    """Fingerprint of raw bytes via their uppercase-hex string — the
    form BOTH engines can compute (DuckDB's md5 only accepts VARCHAR,
    so the oracle hashes substring(hex(blob))); Spark-side the bytes
    are sliced for real and hexed the same way."""
    import binascii
    import hashlib

    return hashlib.md5(binascii.hexlify(b).upper()).hexdigest()


_RESIZE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, new_width bigint, "
    "new_height bigint, n_resized_bytes bigint, resized_md5 string"
)


def _resize_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """2x downsample: halve the dims (ceil) and keep the first half of
    the body bytes — a deterministic stand-in for PIL's resize that
    keeps every byte operation real (parse, slice, fingerprint). A real
    deployment swaps the body slice for Image.resize; container parsing,
    batch iteration, and output schema are unchanged."""
    import struct

    for pdf in batches:
        out = {k: [] for k in ["doc_id", "width", "height", "new_width",
                               "new_height", "n_resized_bytes", "resized_md5"]}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload[:4] != _MAGIC:
                raise ValueError(f"bad media magic {payload[:4]!r} (doc {doc_id})")
            w = struct.unpack(">I", payload[4:8])[0]
            h = struct.unpack(">I", payload[8:12])[0]
            body = bytes(payload[12:])
            resized = body[: len(body) // 2]
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["new_width"].append((w + 1) // 2)
            out["new_height"].append((h + 1) // 2)
            out["n_resized_bytes"].append(len(resized))
            out["resized_md5"].append(_hex_md5(resized))
        yield pd.DataFrame(out)


@query(
    "media_resize",
    """
    SELECT doc_id,
           doc_id % 640 + 16 AS width,
           (doc_id * 7) % 480 + 16 AS height,
           (doc_id % 640 + 16 + 1) // 2 AS new_width,
           ((doc_id * 7) % 480 + 16 + 1) // 2 AS new_height,
           octet_length(encode(text)) // 2 AS n_resized_bytes,
           md5(substring(hex(encode(text)), 1,
                         2 * (octet_length(encode(text)) // 2))) AS resized_md5
    FROM documents ORDER BY doc_id
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize plumbing (training-pipeline multimodal): parse the
    binary container, halve the dimensions, downsample the body — all
    byte-level in an Arrow-batched mapInPandas UDF. The oracle
    re-derives the resized fingerprint independently by slicing the
    hex encoding of the same bytes, so a slicing bug on either side
    breaks the match. Row-local: zero shuffle at any corpus size."""
    d = table(spark, sf_dir, "documents")
    return _media_payload(d).mapInPandas(_resize_media, schema=_RESIZE_SCHEMA).orderBy(
        "doc_id"
    )


_FRAME_SIZE, _FRAME_STRIDE = 64, 4

_FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_md5 string"


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampling: treat the body as a sequence of fixed-size frames
    and emit every Nth complete frame with its fingerprint — the video
    keyframe-sampling shape (one input row fans out to many frame rows,
    a flatMap inside mapInPandas). Swap the fingerprint for an ffmpeg
    frame decode in a real deployment."""
    import struct

    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload[:4] != _MAGIC:
                raise ValueError(f"bad media magic {payload[:4]!r} (doc {doc_id})")
            struct.unpack(">II", payload[4:12])  # dims parse stays real
            body = bytes(payload[12:])
            n_frames = len(body) // _FRAME_SIZE
            for idx in range(0, n_frames, _FRAME_STRIDE):
                frame = body[idx * _FRAME_SIZE : (idx + 1) * _FRAME_SIZE]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_md5"].append(_hex_md5(frame))
        yield pd.DataFrame(out)


@query(
    "media_frame_sample",
    f"""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) // {_FRAME_SIZE} AS n_frames
      FROM documents
    )
    SELECT doc_id,
           unnest(generate_series(0, n_frames - 1, {_FRAME_STRIDE})) AS frame_idx,
           md5(substring(hx,
                 unnest(generate_series(0, n_frames - 1, {_FRAME_STRIDE}))
                   * {2 * _FRAME_SIZE} + 1,
                 {2 * _FRAME_SIZE})) AS frame_md5
    FROM b WHERE n_frames > 0 ORDER BY doc_id, frame_idx
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: every {stride}th fixed-size frame
    of each payload body, one output row per sampled frame — the fan-out
    (flatMap) UDF shape a frame-extraction stage needs, Arrow-batched.
    The oracle independently re-slices the same frames from the hex
    encoding. Row-local fan-out: zero shuffle; output volume is
    frames-per-doc × corpus, the real planning concern at 100 TB."""
    d = table(spark, sf_dir, "documents")
    return (
        _media_payload(d)
        .mapInPandas(_sample_frames, schema=_FRAME_SCHEMA)
        .orderBy("doc_id", "frame_idx")
    )
