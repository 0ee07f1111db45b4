"""Text-analysis building blocks (SURVEY.md C44–C45 + training-pipeline
text ops): tokenization, shingling, fingerprints, quality signals.

Everything is built from JVM-side functions (split / transform /
sequence / xxhash64 / md5) — no Python in the row path, so the hot text
pipeline stays inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, functions as F


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind `value` to a lambda variable, evaluating it exactly once.

    Inside a higher-order-function lambda, Spark re-evaluates captured
    *expressions* on every element visit — compose shingles→minhash→bands
    naively and the text gets re-split O(bands × seeds × shingles) times
    per row. `transform(array(v), body)[0]` forces one evaluation and
    makes every inner reference an O(1) lambda-variable lookup."""
    return F.transform(F.array(value), body).getItem(0)


# whitespace tokenizer — the fixtures are space-separated word salad
def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


# BPE-ish subword segmentation: runs of letters, digits, or single
# punctuation — a public-regex approximation of byte-pair tokenizers
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles as an array<string>; empty array when < k words."""
    return let_(
        tokens(text),
        lambda t: F.when(F.size(t) < k, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - k),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)),
            )
        ),
    )


def shingle_hashes(text: Column | str, k: int = 3) -> Column:
    """k-word shingles as an array<bigint> of xxhash64 keys — the
    signature-side twin of `shingles()` (r17, guide §2.3 "narrower
    types"). The hash sees the k-token string ARRAY directly, so no
    joined shingle string is ever materialized and everything flowing
    downstream (seeded MinHash lanes, band keys, exchanges) is 8-byte
    longs instead of ~25-byte strings. Token boundaries stay
    distinguishable (["ab","c"] and ["a","bc"] hash differently as
    arrays). Use ONLY where the shingle key never leaves the engine
    (MinHash/LSH signatures); exact-Jaccard verification and every
    oracle-visible path keep the string form."""
    return let_(
        tokens(text),
        lambda t: F.when(
            F.size(t) < k, F.array().cast("array<bigint>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - k),
                lambda i: F.xxhash64(F.slice(t, i + 1, k)),
            )
        ),
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    md5 exists verbatim in DuckDB → SQL-oracle-checkable, unlike
    engine-private hashes (xxhash64)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.trim(c)))


def minhash_signature(shingle_col: Column, n_hashes: int = 32) -> Column:
    """MinHash signature: for seed i, min over shingles of
    xxhash64(i, shingle). Deterministic; array<bigint> of length n_hashes.
    Empty shingle set → array of nulls (callers filter)."""
    return let_(
        shingle_col,
        lambda sh: F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(i, s))),
        ),
    )


def band_hashes(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each band of the signature → array<bigint> of
    n_bands bucket ids. Docs sharing any (band_idx, hash) are candidates."""
    return let_(
        signature,
        lambda sig: F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.xxhash64(
                b, F.concat_ws(",", F.slice(sig, b * rows_per_band + 1, rows_per_band))
            ),
        ),
    )


def simhash64(token_col: Column) -> Column:
    """64-bit SimHash over a token array, built with higher-order
    functions: accumulate a 64-long vector of +1/-1 bit votes, then read
    the sign bits into a bigint."""
    votes = F.aggregate(
        token_col,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, tok: F.zip_with(
            acc,
            let_(
                F.xxhash64(tok),  # hash once per token, not once per bit
                lambda h: F.array(
                    *[
                        F.when(
                            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1,
                            F.lit(1).cast("long"),
                        ).otherwise(F.lit(-1).cast("long"))
                        for j in range(64)
                    ]
                ),
            ),
            lambda a, v: a + v,
        ),
    )
    # read the vote signs into a bigint via literal per-bit masks
    # (1 << 63 wraps to long min — encode via two's complement)
    masks = F.array(
        *[F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long") for j in range(64)]
    )
    return F.aggregate(
        F.zip_with(
            votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# language-marker stopwords for the n-gram-free heuristic language ID —
# deterministic, SQL-expressible (mirrors in the DuckDB oracle)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
}


def marker_count(token_col: Column, markers: list[str]) -> Column:
    return F.size(
        F.filter(token_col, lambda t: t.isin(*markers))
    ).cast("bigint")
