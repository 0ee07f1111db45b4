#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the scale-critical
queries, the evidence behind SCALE.md's shuffle/pushdown claims.

Usage: python tools/dump_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from clickhouse_data_rebalance_spark import registry  # noqa: E402
from clickhouse_data_rebalance_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (query, what the plan should show)
SHOWCASE = [
    ("pricing_summary", "pushed filter, pruned scan, partial aggregation, whole-stage codegen"),
    ("join_broadcast_dims", "BroadcastHashJoin on both dims — no shuffle of the fact side"),
    ("top_k", "TakeOrderedAndProject — no global sort materialization"),
    ("dedup_minhash_lsh", "LSH self-join keyed on (band, hash); text never in the shuffle"),
    ("cosine_topk_exact", "1-row broadcast of the query vector + TakeOrderedAndProject"),
    ("ann_ivf_topk", "partition-pruned read of the persisted IVF index (cell IN probe set)"),
    ("knn_join", "label-blocked pair join + per-row rank window; no CartesianProduct"),
    ("pack_token_shards", "range exchange + pid-partitioned cumsum; offsets window is metadata-sized"),
    ("upsert_latest_wins", "single window exchange on the merge key"),
    ("tf_idf", "document-frequency side broadcast"),
    ("dict_get_lookup", "no join operator at all — dictionary lookup is a literal-map expression"),
    ("multi_grain_rollup", "one scan + Expand feeding hour/day/month grains"),
    ("contamination_ngram_overlap", "benchmark grams broadcast; corpus grams never shuffle for the probe"),
    ("chunk_documents", "pure Generate/Project flatMap — no exchange before the presentation sort"),
    ("concurrent_sessions", "day-partitioned running-sum window — no SinglePartition"),
    # round-5 additions
    ("dedup_incremental_batch", "corpus side partition-pruned to batch-touched IVF cells (cell IN ...)"),
    ("ivf_kmeans_cells", "one index scan -> fixed-point centroid partials; K*dim collect is metadata"),
    ("media_feature_extract", "documents scan pruned to doc_id+text; Arrow-batched mapInPandas decode"),
    ("window_range_interval", "RANGE frame over epoch seconds — one user_id exchange"),
    ("time_gap_fill_interpolate", "both direction-fills reuse one user_id partitioning"),
    # round-6 additions
    ("local_supplier_volume", "fixed dims (nation/region) broadcast; same-nation residual rides the suppkey hash join"),
    ("large_volume_customers", "grouped-HAVING subquery stays a distributed LeftSemi; AQE broadcasts the survivor set"),
    ("shipping_priority_topk", "all three filters pushed; TakeOrderedAndProject top-10"),
    ("quantile_state_merge", "per-day KLL sketches; monthly merge input is |days| KB-sized states"),
    ("global_shuffle_shards", "skew-free shard exchange + per-shard window — no SinglePartition sort"),
    ("line_dedup_ratio", "one fingerprint partitioning serves count + dup tagging — no count-join"),
    ("forecast_revenue_change", "all four predicates pushed to the reader; one row out"),
    ("idle_customer_balances", "1-row threshold broadcast + LeftAnti on pre-filtered orders"),
    # round-10 additions
    ("corpus_stage_gate", "row-local integer gram gate — zero wide exchanges before the output sort"),
    ("corpus_stage_dedup", "exactly the pipeline's one fingerprint-hash window exchange"),
    ("corpus_curate_e2e", "counts and rank sides share the dedup-window exchange (ReusedExchange after AQE); plan/budget frames broadcast"),
    ("ch_dialect_array_join_zip", "one inline(zip_with) Generate — never two cross-producting lateral views"),
    ("ch_dialect_with_fill_multi", "gap window partitioned by the leading sort keys — per-series fill, no SinglePartition"),
    # round-11 additions
    ("ch_dialect_quantile_weighted", "ONE ObjectHashAggregate carries the shared pair collect; the plural's sort+folds run in the result projection, once per group"),
    ("ch_dialect_dict_get", "every dictGet decorrelates to a BroadcastHashJoin against the 25-row dim — no nested loop, no per-row subquery"),
    ("dedup_clusters_cc", "label-blocked edge join (equi on label) — no CartesianProduct; per-round join+min reuse the node partitioning"),
    # round-12 additions
    ("ch_dialect_quantile_rank_rules", "ONE shared collect_list feeds all five order-statistic columns (the Exclusive CAST folds away); Inclusive is a bounded-state percentile buffer; 2 exchanges total"),
    ("heavy_hitters_weighted", "map-side-combined per-value weight sums — the bounded-memory path the exact topKWeighted translation routes 100 TB users to"),
    ("asof_join_forward", "union + carry-forward window on ONE equality-key exchange — no BroadcastNestedLoopJoin domain join"),
    # round-13/14 additions (VERDICT r13 #5: the cover flagships with
    # pinned shape tests get PLANS.md evidence too)
    ("ch_dialect_converters", "exception-free try_cast guard (the double pre-parse CASE) visible in the projection; row-local, zero extra exchanges"),
    ("ch_dialect_strings", "r13 wave expressions all row-local in one whole-stage codegen span; one grouped exchange"),
    ("ch_dialect_concat_split", "NULL-guarded concat_ws + \\Q\\E-quoted split all row-local; one grouped exchange"),
    ("ch_dialect_funcs_wave2", "parseDateTime inversion + base64/IPv4 guards + range CASE all row-local; 3-column pruned scan, one grouped exchange (SortAggregate: min over STRING)"),
    ("ch_dialect_funcs_wave3", "digest unhex compositions + hex/bin byte-width pads + transform CASE + epoch buckets all row-local; 3-column pruned scan, one grouped exchange, emptyArray constant-folded"),
    ("ivf_index_admit", "admitted-batch append touches only its cells; probe side stays partition-pruned"),
    ("recursive_cte_chain", "per-iteration equi-join on the chain key — no nested loop"),
]

MAX_LINES = 80


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(  # noqa: SLF001
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    registry.load_all()
    spark = get_spark("cdr-plans")
    out = [
        "# Physical plans — evidence for SCALE.md",
        "",
        f"Generated by `tools/dump_plans.py` at `{SF_DIR}` (plan shape is "
        "scale-independent; AQE may re-plan exchanges at runtime).",
        "",
    ]
    for name, claim in SHOWCASE:
        df = registry.QUERIES[name](spark, SF_DIR)
        lines = plan_of(df).rstrip().splitlines()
        shown = lines[:MAX_LINES]
        if len(lines) > MAX_LINES:
            shown.append(f"... ({len(lines) - MAX_LINES} more lines)")
        out += [f"## {name}", "", f"*Expected shape:* {claim}", "", "```"]
        out += shown
        out += ["```", ""]
    with open(os.path.join(ROOT, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md written ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
