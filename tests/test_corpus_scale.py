"""Gated scale validation of the corpus-pipeline family at 200k
documents (400x the fixture's 500-row documents table, r10): synthesize
a corpus with KNOWN structure — repetitive docs the Gopher gate must
drop, exact-duplicate pairs (one raw, one case-varied) the normalized
fingerprint must collapse — write it once to parquet, then run the SAME
registered Spark queries AND their DuckDB oracles over that parquet and
exact-compare, the driver's own differential at scale. The synthesis is
pure Spark expression work (md5-derived words), so the corpus is
deterministic without any driver-side generation.

Gated behind ``CDR_CORPUS_SCALE=1`` (~2 min). Numbers recorded in
SCALE.md §corpus-at-200k.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_data_rebalance_spark.registry import ORACLES, QUERIES, load_all

from .conftest import SF_SMALL
from .oracle_harness import TABLE_NAMES, compare, duck_connection

load_all()

N_DOCS = 200_000
FAMILY = [
    "corpus_stage_gate",
    "corpus_stage_dedup",
    "corpus_stage_split",
    "corpus_pipeline_e2e",
    "corpus_pipeline_e2e_keep_longest",
    # the full curation flagship rides too: its idx parse is total
    # (COALESCE(TRY_CAST...)), so the synthetic single-source corpus
    # exercises the max-weight branch at scale
    "corpus_curate_e2e",
]


def _synth_documents(spark, out_dir: str) -> None:
    """200k docs, all columns expression-derived from doc_id:

    - content_key: ids k*10 and k*10+1 share one key -> exact duplicate
      PAIRS (~10% of the corpus); the +1 twin is uppercased AND carries
      two trailing spaces, so only the NORMALIZED (lower+trim)
      fingerprint collapses the pair while the RAW texts differ in both
      case and length — 'longest' keeps the twin, 'min_id' the base, so
      the two e2e keeper policies must produce DIFFERENT outputs.
    - the first token is md5(ck) itself (review-4 r10: a vocabulary-only
      construction aliased texts mod 4985, silently collapsing 171k
      gate-passers to ~5k under ANY fingerprint — the anchor token makes
      the designed pairs the ONLY duplicates).
    - repetitive docs (content_key % 7 == 3): tokens cycling a 3-word
      vocabulary -> duplicate-5-gram fraction ~0.9, gate drops.
    - normal docs: 29 vocabulary tokens stepping a 997-word md5 vocab
      with a per-doc stride -> high distinct-gram fraction, gate keeps.
    """
    d = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    ck = F.when(
        (F.col("doc_id") % 10) < 2, F.col("doc_id") - (F.col("doc_id") % 10)
    ).otherwise(F.col("doc_id"))
    word = lambda e: F.substring(F.md5(e.cast("string")), 1, 5)  # noqa: E731
    anchor = F.md5(F.concat(F.lit("u"), ck.cast("string")))
    norm_tok = F.concat(
        F.array(anchor),
        F.transform(
            F.sequence(F.lit(0), F.lit(28)),
            lambda j: word((ck * 31 + j * (ck % 5 + 1)) % 997),
        ),
    )
    rep_tok = F.transform(
        F.sequence(F.lit(0), F.lit(29)), lambda j: word(j % 3)
    )
    text = F.array_join(
        F.when(ck % 7 == 3, rep_tok).otherwise(norm_tok), " "
    )
    text = F.when(
        F.col("doc_id") % 10 == 1, F.concat(F.upper(text), F.lit("  "))
    ).otherwise(text)
    out = d.select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (ck % 3 + 1).cast("int"),
        ).alias("lang"),
        F.lit("synth").alias("source"),
        F.length(text).cast("bigint").alias("n_chars"),
    )
    # DuckDB's fixture views read single FILES (like the testdata
    # layout), so land one part file and move it into place
    import glob
    import shutil

    stage = out_dir + ".stage"
    out.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, out_dir)
    shutil.rmtree(stage)


@pytest.mark.skipif(
    os.environ.get("CDR_CORPUS_SCALE") != "1",
    reason="~2 min: 200k-doc corpus-pipeline differential; set CDR_CORPUS_SCALE=1",
)
def test_corpus_pipeline_family_at_200k(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus200k")
    os.makedirs(corpus_dir, exist_ok=True)
    _synth_documents(spark, os.path.join(corpus_dir, "documents.parquet"))
    # the loader wants the full fixture set — symlink the siblings
    for t in TABLE_NAMES:
        if t == "documents":
            continue
        os.symlink(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(corpus_dir, f"{t}.parquet"),
        )

    con = duck_connection(corpus_dir)
    # structural sanity on the synthesized corpus: the gate must
    # actually drop rows, the dedup must collapse exactly the designed
    # pairs AND only under NORMALIZATION (raw-distinct texts stay ~= the
    # passer count — a buggy raw fingerprint could not pass), and the
    # two keeper policies must be output-distinguishable
    n_gated, n_passed = con.execute(
        f"""
        WITH g AS ({ORACLES['corpus_stage_gate']})
        SELECT COUNT(*) FILTER (WHERE passed = 0),
               COUNT(*) FILTER (WHERE passed = 1) FROM g
        """
    ).fetchone()
    assert n_gated > 10_000, n_gated  # ~1/7 of content keys repeat
    n_kept = con.execute(
        f"SELECT COUNT(*) FROM ({ORACLES['corpus_stage_dedup']})"
    ).fetchone()[0]
    assert n_kept < n_passed - 10_000, (n_kept, n_passed)  # dup pairs collapsed
    n_raw_distinct = con.execute(
        "SELECT COUNT(DISTINCT text) FROM documents "
        "WHERE len(string_split(text, ' ')) >= 5"
    ).fetchone()[0]
    # raw texts are all distinct among passers (the twins differ in case
    # + trailing spaces): collapse happens ONLY via lower+trim
    assert n_raw_distinct > n_kept + 10_000, (n_raw_distinct, n_kept)
    e2e = con.execute(ORACLES["corpus_pipeline_e2e"]).fetchall()
    e2e_long = con.execute(
        ORACLES["corpus_pipeline_e2e_keep_longest"]
    ).fetchall()
    assert e2e != e2e_long, "keeper policies must be distinguishable"

    for name in FAMILY:
        compare(
            QUERIES[name](spark, corpus_dir),
            con,
            ORACLES[name],
            name=f"{name}@200k",
        )
