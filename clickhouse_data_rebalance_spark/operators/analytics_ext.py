"""Extended analytics operators (ClickHouse function-parity beyond the
SURVEY §2 checklist): heavy hitters (`topK` analog), cohort retention
(`retention` analog), unpivot/melt, the salted hot-key aggregation
pattern, and per-label embedding centroids (distributed vector
aggregation).

Scale notes per operator are in the docstrings; all are pure DataFrame
pipelines with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import query
from ..tables import table
from ._util import dec_sum, sql_dec_sum


@query(
    "heavy_hitters",
    """
    SELECT * FROM (
      SELECT l_returnflag, l_partkey, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_partkey) AS rnk
      FROM lineitem GROUP BY l_returnflag, l_partkey) t
    WHERE rnk <= 5 ORDER BY l_returnflag, rnk
    """,
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `topK(5)(col)` analog, computed exactly: count per
    (group, value) with map-side partial aggregation, then a window
    top-N per group. Two shuffles, both on bounded-cardinality keys —
    at 100 TB the first agg reduces the data to |groups|·|values| rows
    before anything wide happens. (A Misra-Gries sketch would make this
    one pass; the exact form is the oracle-checkable baseline.)"""
    l = table(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_returnflag", "l_partkey").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("l_returnflag").orderBy(F.col("n").desc(), F.col("l_partkey"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .orderBy("l_returnflag", "rnk")
    )


@query(
    "cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS act_day
      FROM events
    )
    SELECT f.cohort_day,
           COUNT(DISTINCT f.user_id) AS cohort_size,
           COUNT(DISTINCT CASE WHEN a.act_day = f.cohort_day + INTERVAL 1 DAY
                               THEN a.user_id END) AS retained_d1,
           COUNT(DISTINCT CASE WHEN a.act_day = f.cohort_day + INTERVAL 3 DAY
                               THEN a.user_id END) AS retained_d3
    FROM firsts f JOIN activity a ON a.user_id = f.user_id
    GROUP BY f.cohort_day ORDER BY f.cohort_day
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `retention()` analog: per first-seen-day cohort, how
    many users return on day+1 / day+3. Shape: two aggregations over
    (user, day) plus one equi-join on user_id — each shuffle carries one
    row per (user, day), never raw events, so it survives any event
    volume with bounded user cardinality."""
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    firsts = e.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = e.select("user_id", day.alias("act_day")).distinct()
    j = firsts.join(activity, "user_id")
    return (
        j.groupBy("cohort_day")
        .agg(
            F.countDistinct("user_id").alias("cohort_size"),
            F.countDistinct(
                F.when(F.col("act_day") == F.date_add("cohort_day", 1), F.col("user_id"))
            ).alias("retained_d1"),
            F.countDistinct(
                F.when(F.col("act_day") == F.date_add("cohort_day", 3), F.col("user_id"))
            ).alias("retained_d3"),
        )
        .orderBy("cohort_day")
    )


@query(
    "unpivot_metrics",
    f"""
    SELECT l_returnflag, metric, {sql_dec_sum('val')} AS total
    FROM (
      SELECT l_returnflag, 'quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
    ) u
    GROUP BY l_returnflag, metric
    ORDER BY l_returnflag, metric
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide → long) via the native unpivot operator — a
    generator expression, not a UNION of three scans: ONE pass over the
    table emits the three (metric, value) rows per input row."""
    l = table(spark, sf_dir, "lineitem")
    long = l.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_extendedprice", "price")
        .otherwise("discount"),
    )
    return (
        long.groupBy("l_returnflag", "metric")
        .agg(dec_sum("val").alias("total"))
        .orderBy("l_returnflag", "metric")
    )


@query(
    "salted_hot_key_agg",
    f"""
    SELECT o_orderstatus, COUNT(*) AS n, {sql_dec_sum('o_totalprice')} AS total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-stage salted aggregation pattern for pathologically hot
    grouping keys (3 statuses over ALL orders — every row hits one of 3
    reducers in the naive plan). Stage 1 aggregates on (key, salt) —
    spreading each hot key over 16 reducers — stage 2 merges the 3·16
    partials. Result is EXACTLY the plain groupBy (decimal partials merge
    associatively), which is what the oracle states.

    Spark's map-side partial aggregation already handles most of this;
    the explicit salt matters when upstream partitioning is already
    key-clustered (post-repartition) and partial agg can't help."""
    o = table(spark, sf_dir, "orders")
    salt = F.pmod(F.xxhash64("o_orderkey"), F.lit(16)).alias("salt")
    partial = (
        o.select("o_orderstatus", "o_totalprice", salt)
        .groupBy("o_orderstatus", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(30,4)")).alias("pt"),
        )
    )
    return (
        partial.groupBy("o_orderstatus")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("pt").cast("double").alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "label_centroids",
    """
    SELECT label, pos,
           CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE)
             / COUNT(*) AS centroid_val
    FROM (
      SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS v
      FROM embeddings)
    WHERE pos <= 4
    GROUP BY label, pos ORDER BY label, pos
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed vector aggregation: the per-label mean embedding —
    the building block for k-means refits, class prototypes, and
    IVF-centroid updates. posexplode turns (label, vector) into
    (label, dim, component) so the mean is an ordinary hash aggregate:
    one shuffle carrying |labels|·dim partials, no vectors on the
    driver. Output limited to the first 4 dims to keep the driver row
    budget small; the aggregation itself runs over all 64.

    Components go through DECIMAL(30,10) before summing (the _util
    decimal-sum trick) so the mean is order-independent and
    bit-identical across engines."""
    e = table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos0", "v")
    ).select("label", (F.col("pos0") + 1).cast("bigint").alias("pos"), "v")
    return (
        exploded.filter(F.col("pos") <= 4)
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(30,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid_val")
        )
        .orderBy("label", "pos")
    )
