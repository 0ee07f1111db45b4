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


@query(
    "upsert_latest_wins",
    """
    SELECT user_id, event_type, ts AS latest_ts, value AS latest_value FROM (
      SELECT user_id, event_type, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1 ORDER BY user_id, event_type
    """,
)
def upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree `FINAL` analog: the logical table keeps only
    the newest row per merge key (user_id, event_type), version order
    (ts, event_id) — the same latest-wins collapse ClickHouse performs
    at background-merge/FINAL time, done eagerly as one window over the
    merge-key hash partition.

    Scale: a single shuffle on the merge key. At 100 TB this runs as a
    per-ingest-batch compaction (MERGE over only the touched key range /
    partition), not a full-table window — the collapse rule and output
    are identical, so this form is the correctness spec for that job."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "sequence_match_funnel3",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, MIN(e.ts) AS t_click
               FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
               WHERE e.event_type = 'click' GROUP BY e.user_id),
         p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
               FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
    FROM v JOIN c ON v.user_id = c.user_id JOIN p ON c.user_id = p.user_id
    ORDER BY v.user_id
    """,
)
def sequence_match_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `sequenceMatch('(?1).*(?2).*(?3)')` analog: users with
    a view, then a later click, then a later purchase. Greedy
    earliest-first matching (first view → first click after it → first
    purchase after that) is exact for ordered-subsequence existence, so
    the emitted timestamps are a deterministic witness.

    Scale: three aggregations and two joins, ALL keyed on user_id —
    one partitioning reused end-to-end (no re-shuffle between stages
    once the first exchange lands); per-stage state is one row per
    user, never the event list."""
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id").join(p, "user_id")
        .select("user_id", "t_view", "t_click", "t_purchase")
        .orderBy("user_id")
    )


@query(
    "window_funnel_levels",
    """
    WITH clk AS (SELECT user_id, ts AS t1 FROM events WHERE event_type = 'click'),
    chains2 AS (
      SELECT c.user_id, c.t1, MIN(v.ts) AS t2
      FROM clk c JOIN events v
        ON v.user_id = c.user_id AND v.event_type = 'view'
       AND v.ts > c.t1 AND v.ts <= c.t1 + INTERVAL 1 HOUR
      GROUP BY c.user_id, c.t1
    ),
    l3 AS (
      SELECT DISTINCT ch.user_id
      FROM chains2 ch JOIN events p
        ON p.user_id = ch.user_id AND p.event_type = 'purchase'
       AND p.ts > ch.t2 AND p.ts <= ch.t1 + INTERVAL 1 HOUR
    ),
    l2 AS (SELECT DISTINCT user_id FROM chains2),
    l1 AS (SELECT DISTINCT user_id FROM clk)
    SELECT l1.user_id,
           CAST(1 + CASE WHEN l2.user_id IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN l3.user_id IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS funnel_level
    FROM l1 LEFT JOIN l2 ON l1.user_id = l2.user_id
            LEFT JOIN l3 ON l1.user_id = l3.user_id
    ORDER BY l1.user_id
    """,
)
def window_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `windowFunnel(1h)(ts, click, view, purchase)` parity:
    per user, the deepest click → view → purchase chain whose every
    step lands within 1 hour OF THE CHAIN'S FIRST EVENT (CH anchors the
    window at step 1 — unlike `sequence_match_funnel3`, which is the
    unwindowed ordered-subsequence form).

    Greedy-earliest is exact here: for a fixed chain start t1 the
    window budget depends only on t1, so taking MIN(view ts) per
    (user, t1) maximizes the room left for the purchase step — if any
    chain from t1 completes, the min-view chain completes.

    Scale: every join and aggregate is keyed on user_id — one
    partitioning reused end-to-end; intermediate `chains2` is bounded
    by per-user click counts, never a cross join (per-user row counts
    bound the pair blowup, same argument as `funnel_conversion`)."""
    e = table(spark, sf_dir, "events")
    hour = F.expr("INTERVAL 1 HOUR")
    clk = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("t1")
    )
    vw = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("tv")
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("tp")
    )
    chains2 = (
        clk.join(vw, clk["user_id"] == vw["v_user"])
        .filter((F.col("tv") > F.col("t1")) & (F.col("tv") <= F.col("t1") + hour))
        .groupBy("user_id", "t1")
        .agg(F.min("tv").alias("t2"))
    )
    l3 = (
        chains2.join(pur, chains2["user_id"] == pur["p_user"])
        .filter((F.col("tp") > F.col("t2")) & (F.col("tp") <= F.col("t1") + hour))
        .select("user_id")
        .distinct()
        .withColumn("has3", F.lit(1))
    )
    l2 = chains2.select("user_id").distinct().withColumn("has2", F.lit(1))
    l1 = clk.select("user_id").distinct()
    return (
        l1.join(l2, "user_id", "left")
        .join(l3, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.when(F.col("has2").isNotNull(), 1).otherwise(0)
                + F.when(F.col("has3").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("funnel_level"),
        )
        .orderBy("user_id")
    )


@query(
    "sum_map_props",
    f"""
    SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS prop_k,
           {sql_dec_sum('value')} AS total_value, COUNT(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def sum_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `sumMap` analog: each event contributes a one-entry
    map {prop-bucket: value}; the aggregate is the key-wise sum of those
    maps per event_type. Built with real map ops — create_map →
    explode — then a hash aggregate, which IS how a distributed sumMap
    merges: map-side partials per key, one shuffle of (group, key)
    partial sums. Values ride the decimal-sum trick for bit-exactness."""
    e = table(spark, sf_dir, "events")
    m = F.create_map(
        F.get_json_object(F.col("props"), "$.k").cast("bigint") % 10,
        F.col("value"),
    )
    return (
        e.select("event_type", F.explode(m).alias("prop_k", "v"))
        .groupBy("event_type", "prop_k")
        .agg(dec_sum("v").alias("total_value"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "prop_k")
    )


@query(
    "ttl_expiry",
    """
    WITH cutoff AS (SELECT MAX(ts) - INTERVAL 7 DAY AS c FROM events)
    SELECT event_type, COUNT(*) AS retained, MIN(ts) AS oldest_kept
    FROM events, cutoff WHERE ts >= cutoff.c
    GROUP BY event_type ORDER BY event_type
    """,
)
def ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse table-TTL analog (`TTL ts + INTERVAL 7 DAY DELETE`,
    anchored at the corpus max so the fixture is time-stable): rows
    older than the horizon are expired; the query returns what survives.

    Scale: the cutoff is a 1-row broadcast; the age predicate is a plain
    pushable filter. On a ts-partitioned table (the layout an events
    table would ship with) expiry is partition pruning + directory
    drops — no row-level rewrite at all."""
    e = table(spark, sf_dir, "events")
    cutoff = e.agg(F.expr("max(ts) - INTERVAL 7 DAYS").alias("c"))
    return (
        e.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("retained"),
            F.min("ts").alias("oldest_kept"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_state_merge",
    f"""
    SELECT event_type, COUNT(*) AS n, {sql_dec_sum('value')} AS total_value,
           ({sql_dec_sum('value')} / COUNT(*)) AS avg_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree analog: maintain PARTIAL aggregate states at
    a fine grain (per day × event_type — the rows an incremental
    materialized view would persist on each ingest), then finalize by
    MERGING states across days: counts add, exact decimal sums add,
    min/max combine, avg = merged-sum / merged-count. The oracle is the
    direct one-shot aggregate — merge-of-partials must equal it exactly,
    which is precisely the mergeability contract ClickHouse's -State /
    -Merge combinators (and Spark's own partial aggregation) rely on.

    Scale: the state table is |days|·|types| rows regardless of event
    volume; re-finalizing after new ingest touches states, not raw
    events. Decimal sums make the merge order-independent, so the
    equality holds under any partitioning."""
    e = table(spark, sf_dir, "events")
    states = (
        e.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("s_n"),
            F.sum(F.col("value").cast("decimal(30,4)")).alias("s_sum"),
            F.min("value").alias("s_min"),
            F.max("value").alias("s_max"),
        )
    )
    return (
        states.groupBy("event_type")
        .agg(
            F.sum("s_n").alias("n"),
            F.sum("s_sum").cast("double").alias("total_value"),
            (F.sum("s_sum").cast("double") / F.sum("s_n")).alias("avg_value"),
            F.min("s_min").alias("min_value"),
            F.max("s_max").alias("max_value"),
        )
        .orderBy("event_type")
    )


@query(
    "median_exact",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 9) AS q25_qty,
           ROUND(quantile_cont(l_quantity, 0.5), 9) AS med_qty,
           ROUND(quantile_cont(l_quantity, 0.75), 9) AS q75_qty,
           ROUND(quantile_cont(l_extendedprice, 0.5), 9) AS med_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles (ClickHouse `quantileExact` analog;
    complements the mergeable-sketch `approx_quantiles`): Spark's
    `percentile` computes the same linear-interpolated order statistic
    as DuckDB's quantile_cont; ROUND(,9) absorbs the last-ulp
    interpolation difference.

    Scale: exact quantiles need the group's values together — one
    shuffle on the group key, memory ∝ group size. That is the honest
    cost of exactness; the sketch variant is the 100 TB default and
    this is the auditor."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", 0.25), 9).alias("q25_qty"),
            F.round(F.percentile("l_quantity", 0.5), 9).alias("med_qty"),
            F.round(F.percentile("l_quantity", 0.75), 9).alias("q75_qty"),
            F.round(F.percentile("l_extendedprice", 0.5), 9).alias("med_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "collapsing_sign_merge",
    f"""
    WITH signed AS (
      SELECT o_custkey, 1 AS sign, o_totalprice FROM orders
      UNION ALL
      SELECT o_custkey, -1 AS sign, o_totalprice FROM orders
      WHERE o_orderstatus = 'F'
    )
    SELECT o_custkey,
           CAST(SUM(sign) AS BIGINT) AS net_orders,
           {sql_dec_sum('sign * o_totalprice')} AS net_value
    FROM signed GROUP BY o_custkey
    HAVING SUM(sign) > 0
    ORDER BY o_custkey
    """,
)
def collapsing_sign_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree analog: state changes arrive as (+1 row,
    -1 cancel) pairs and the merged view is the sign-weighted aggregate
    with fully-cancelled keys collapsed away. Here every order carries
    +1 and finished ('F') orders a compensating -1 — net_orders and
    net_value are what survives, HAVING drops keys that cancelled to
    zero. Sign-weighted decimal sums keep the collapse order-independent
    and bit-exact.

    Scale: collapse is an ordinary hash aggregate on the key — the
    background-merge semantics of the ClickHouse engine expressed as one
    shuffle; incremental form = agg_state_merge over signed partials."""
    o = table(spark, sf_dir, "orders")
    signed = o.select(
        "o_custkey", F.lit(1).alias("sign"), "o_totalprice"
    ).unionByName(
        o.filter(F.col("o_orderstatus") == "F").select(
            "o_custkey", F.lit(-1).alias("sign"), "o_totalprice"
        )
    )
    return (
        signed.groupBy("o_custkey")
        .agg(
            F.sum("sign").alias("net_orders"),
            dec_sum(F.col("sign") * F.col("o_totalprice")).alias("net_value"),
        )
        .filter(F.col("net_orders") > 0)
        .orderBy("o_custkey")
    )


@query(
    "variant_json_extract",
    f"""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
           COUNT(*) AS n, {sql_dec_sum('value')} AS total_value
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) >= 50
    GROUP BY 1 ORDER BY 1
    """,
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (ClickHouse JSON/Object-type parity,
    Spark 4 VariantType): `props` parses once into a variant, fields are
    extracted with typed `variant_get` — the open-schema ingestion shape
    where payload fields aren't known at write time. Distinct from the
    string-path `json_funcs` (get_json_object re-parses per call;
    variant parses once into a binary-encoded tree and extraction is
    O(field), the right shape when many fields are read per row).

    Scale: parse + extract are row-local; the aggregate shuffles a
    10-key bucket. Variant binary also pushes through shuffles/spills
    cheaper than JSON text."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return (
        e.select(k.alias("k"), "value")
        .filter(F.col("k") >= 50)
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("value").alias("total_value"))
        .orderBy("k_bucket")
    )


@query(
    "delta_sum_running",
    f"""
    WITH ordered AS (
      SELECT user_id, value,
             value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS delta
      FROM events WHERE event_type = 'view'
    )
    SELECT user_id, COUNT(*) AS n_events,
           {sql_dec_sum("CASE WHEN delta > 0 THEN delta ELSE 0.0 END")}
             AS delta_sum,
           {sql_dec_sum("COALESCE(delta, 0.0)")} AS net_change
    FROM ordered GROUP BY user_id ORDER BY user_id
    """,
)
def delta_sum_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `deltaSum` / `runningDifference` parity: per-user
    ordered deltas of a gauge column; `delta_sum` accumulates only
    positive steps (the counter-rate semantics — a counter reset shows
    as a negative delta and is skipped), `net_change` is the plain
    telescoping difference. The monitoring/time-series shape.

    Scale: one hash partition per user for the lag window, then the
    same partitioning reused by the aggregate — a single shuffle; no
    driver-side state."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    return (
        e.select("user_id", delta.alias("delta"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(F.lit(0.0))).alias(
                "delta_sum"
            ),
            dec_sum(F.coalesce("delta", F.lit(0.0))).alias("net_change"),
        )
        .orderBy("user_id")
    )


_WMEDIAN_SQL = """
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(CAST(l_quantity AS DECIMAL(30,4)))
               OVER (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice, l_orderkey, l_linenumber
                     ROWS UNBOUNDED PRECEDING) AS cum_w,
             SUM(CAST(l_quantity AS DECIMAL(30,4)))
               OVER (PARTITION BY l_returnflag) AS total_w
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(l_extendedprice) FILTER (WHERE cum_w * 2 >= total_w)
             AS weighted_median,
           CAST(MIN(total_w) AS DOUBLE) AS total_weight
    FROM cum GROUP BY l_returnflag ORDER BY l_returnflag
    """


@query("weighted_median", _WMEDIAN_SQL)
def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `quantileExactWeighted(0.5)(price, quantity)` parity:
    the smallest value whose cumulative weight reaches half the group's
    total weight. Weights accumulate in DECIMAL so the crossing point is
    order-exact in both engines (a float running sum could cross the
    threshold one row apart).

    Scale: one window + one aggregate over the same group partitioning
    — the sort inside each hash partition is the only extra cost; no
    all-values collect (contrast a naive percentile gather)."""
    l = table(spark, sf_dir, "lineitem")
    wq = F.col("l_quantity").cast("decimal(30,4)")
    w_cum = (
        W.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("l_returnflag")
    cum = l.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(wq).over(w_cum).alias("cum_w"),
        F.sum(wq).over(w_all).alias("total_w"),
    )
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.min(
                F.when(F.col("cum_w") * 2 >= F.col("total_w"), F.col("l_extendedprice"))
            ).alias("weighted_median"),
            F.min("total_w").cast("double").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "multi_grain_rollup",
    f"""
    WITH g AS (
      SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
             date_trunc('month', ts) AS m, value
      FROM events
    )
    SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour'
                WHEN GROUPING(d) = 0 THEN 'day' ELSE 'month' END AS grain,
           COALESCE(h, d, m) AS bucket_start,
           COUNT(*) AS n_events,
           {sql_dec_sum('value')} AS total_value
    FROM g GROUP BY GROUPING SETS ((h), (d), (m))
    ORDER BY grain, bucket_start
    """,
)
def multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain time rollup in ONE pass: hour, day, and month
    aggregates from a single scan via GROUPING SETS — the ClickHouse
    cascading-materialized-view pattern (hourly MV feeding daily feeding
    monthly) collapsed into one job.

    Scale: one scan + one expand + one shuffle instead of three separate
    jobs (or an MV chain with refresh lag); partial aggregation still
    applies map-side per grain, and the hour grain dominates the row
    count so the expand factor stays under 3/2."""
    from ..tables import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        f"""
        WITH g AS (
          SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
                 date_trunc('month', ts) AS m, value
          FROM events
        )
        SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour'
                    WHEN GROUPING(d) = 0 THEN 'day' ELSE 'month' END AS grain,
               COALESCE(h, d, m) AS bucket_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total_value
        FROM g GROUP BY GROUPING SETS ((h), (d), (m))
        ORDER BY grain, bucket_start
        """
    )


@query(
    "concurrent_sessions",
    """
    WITH b AS (
      SELECT CAST(ts AS DATE) AS day, ts AS bts, 1 AS delta FROM events
      UNION ALL
      SELECT CAST(ts + INTERVAL 5 MINUTE AS DATE), ts + INTERVAL 5 MINUTE, -1
      FROM events
    ),
    r AS (
      SELECT day, delta,
             SUM(delta) OVER (PARTITION BY day ORDER BY bts, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS run
      FROM b
    ),
    c AS (
      SELECT CAST(ts + INTERVAL 5 MINUTE AS DATE) AS day, COUNT(*) AS carry
      FROM events
      WHERE CAST(ts AS DATE) < CAST(ts + INTERVAL 5 MINUTE AS DATE)
      GROUP BY 1
    )
    SELECT r.day,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
           CAST(COALESCE(MAX(c.carry), 0) + GREATEST(0, MAX(run))
                AS BIGINT) AS max_concurrent
    FROM r LEFT JOIN c ON r.day = c.day
    GROUP BY r.day ORDER BY r.day
    """,
)
def concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `runningConcurrency` analog: peak number of
    simultaneously-open 5-minute sessions per day, via the boundary
    trick — each interval emits (+1 at start, -1 at end), a running sum
    over ordered boundaries IS the concurrency curve.

    The prefix sum is PARTITIONED BY DAY (not one global window): each
    day's curve starts from a carry-in count of sessions spanning
    midnight, computed by a tiny per-day aggregate that broadcast-joins
    back. Sessions shorter than the grain guarantee the carry never
    reaches further than one day. For coarser partitions at 100 TB the
    two-level prefix-sum pattern (pack_token_shards) applies instead.
    """
    e = table(spark, sf_dir, "events")
    ts_end = F.col("ts") + F.expr("INTERVAL 5 MINUTES")
    starts = e.select(
        F.to_date("ts").alias("day"), F.col("ts").alias("bts"), F.lit(1).alias("delta")
    )
    ends = e.select(
        F.to_date(ts_end).alias("day"), ts_end.alias("bts"), F.lit(-1).alias("delta")
    )
    w = (
        W.partitionBy("day")
        .orderBy("bts", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = starts.unionAll(ends).withColumn("run", F.sum("delta").over(w))
    carry = (
        e.filter(F.to_date("ts") < F.to_date(ts_end))
        .groupBy(F.to_date(ts_end).alias("day"))
        .agg(F.count("*").alias("carry"))
    )
    return (
        r.groupBy("day")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_starts"),
            F.max("run").alias("mx"),
        )
        .join(F.broadcast(carry), "day", "left")
        .select(
            "day",
            F.col("n_starts").cast("bigint").alias("n_starts"),
            (F.coalesce(F.col("carry"), F.lit(0)) + F.greatest(F.lit(0), F.col("mx")))
            .cast("bigint")
            .alias("max_concurrent"),
        )
        .orderBy("day")
    )


@query(
    "uniq_state_merge",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS exact_daily
      FROM events GROUP BY 1
    ),
    monthly AS (SELECT COUNT(DISTINCT user_id) AS exact_month FROM events)
    SELECT day, exact_daily, exact_month,
           TRUE AS daily_within_5pct, TRUE AS month_within_5pct
    FROM daily, monthly ORDER BY day
    """,
)
def uniq_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `uniqState` / `uniqMerge` parity: per-day HyperLogLog
    sketches (Spark's Apache DataSketches `hll_sketch_agg`) whose UNION
    re-estimates the monthly distinct count WITHOUT rescanning events —
    the incremental-MV pattern for distinct counts, which plain
    COUNT(DISTINCT) cannot do (it is not mergeable).

    The oracle states the exact daily/monthly counts; the sketch
    estimates must land within 5% (HLL lgK=14 standard error is ~0.8%,
    so the gate has huge margin yet still catches a broken merge).

    Scale: events shuffle once on day; the merge input is |days|
    sketches of ~16 KB — the monthly rollup reads kilobytes, not the
    corpus. This is why state-style aggregation wins at 100 TB."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_daily"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_month"),
        F.sum(F.lit(0)).alias("_z"),  # keep agg non-empty shape stable
    ).select("est_month")
    exact_month = e.agg(F.countDistinct("user_id").alias("exact_month"))
    out = (
        daily.withColumn("est_daily", F.hll_sketch_estimate("sk"))
        .crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(exact_month))
    )
    within = lambda est, exact: (  # noqa: E731
        F.abs(est.cast("double") / exact.cast("double") - 1.0) <= 0.05
    )
    return out.select(
        "day",
        "exact_daily",
        "exact_month",
        within(F.col("est_daily"), F.col("exact_daily")).alias("daily_within_5pct"),
        within(F.col("est_month"), F.col("exact_month")).alias("month_within_5pct"),
    ).orderBy("day")


@query(
    "exponential_moving_avg",
    """
    WITH s AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           CAST(floor(list_reduce(vals, (acc, v) -> 0.25 * v + 0.75 * acc)
                      * 1073741824.0) AS BIGINT) AS ema_fp30
    FROM s ORDER BY user_id
    """,
)
def exponential_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `exponentialMovingAverage` analog (row-count decay,
    alpha = 0.25): the final EMA of `value` per user over events in
    (ts, event_id) order — the smoothing step of a metrics pipeline.

    Both engines fold the SAME ordered double sequence with the SAME
    expression (0.25*v + 0.75*acc, seeded with the first element:
    DuckDB's list_reduce and Spark's F.aggregate both start the
    accumulator at element 1), so the IEEE result is bit-identical —
    no float tolerance needed; the output is floor-fixed-point (2^30)
    per the repo's cross-engine float convention.

    Scale: one groupBy shuffle carrying (ts, event_id, value) triples;
    the fold is row-local array math in codegen. Per-key state is the
    user's event list — bounded by per-user activity, the same bound
    every per-user sessionization op here carries. A streaming EMA
    (applyInPandasWithState) keeps O(1) state instead; this is the
    batch/backfill form.
    """
    e = table(spark, sf_dir, "events")
    vals = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    g = e.groupBy("user_id").agg(vals.alias("vals"))
    ema = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(F.col("vals"), 1),
        lambda acc, v: F.lit(0.25) * v + F.lit(0.75) * acc,
    )
    return g.select(
        "user_id",
        F.size("vals").cast("bigint").alias("n_events"),
        F.floor(ema * 1073741824.0).cast("bigint").alias("ema_fp30"),
    ).orderBy("user_id")


@query(
    "interval_length_sum",
    """
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
      FROM events
    ),
    m AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM m
    ),
    g AS (
      SELECT user_id, island, MAX(e) - MIN(s) AS len
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(len) AS BIGINT) AS union_len_us
    FROM g GROUP BY user_id ORDER BY user_id
    """,
)
def interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `intervalLengthSum` analog: per user, the total length
    of the UNION of [ts, ts + 30 min) activity intervals (overlaps
    counted once) plus the merged-interval count — the classic
    gaps-and-islands shape. Interval arithmetic runs on microsecond
    epochs (exact BIGINT), never on engine-specific INTERVAL types.

    Scale: ONE hash partitioning on user_id serves the running-max
    window, the island-id running sum, and both aggregations — no
    re-shuffle between stages; per-partition window state is O(1)
    (running max / running sum), never the interval list.
    """
    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.lit(1800000000).cast("long")
        ).alias("e"),
    )
    w = W.partitionBy("user_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    m = iv.withColumn("prev_max", prev_max)
    new_island = F.when(
        F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")), 1
    ).otherwise(0)
    isl = m.withColumn(
        "island",
        F.sum(new_island).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    g = isl.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("len")
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum("len").cast("bigint").alias("union_len_us"),
        )
        .orderBy("user_id")
    )


@query(
    "sequence_count_pattern",
    """
    WITH sym AS (
      SELECT user_id,
             string_agg(CASE event_type WHEN 'view' THEN 'a' ELSE 'b' END,
                        '' ORDER BY ts, event_id) AS s
      FROM events
      WHERE event_type IN ('view', 'purchase')
      GROUP BY user_id
    )
    SELECT user_id,
           CAST((length(s) - length(replace(s, 'ab', ''))) / 2 AS BIGINT)
             AS n_matches
    FROM sym ORDER BY user_id
    """,
)
def sequence_count_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `sequenceCount('(?1)(?2)')(ts, view, purchase)`
    analog: per user, how many NON-OVERLAPPING times a view is
    immediately followed by a purchase in the (ts, event_id)-ordered
    sequence of view/purchase events. Complements the existence-only
    `sequence_match_funnel3`: this one counts.

    Both engines reduce the pattern to string algebra on an identical
    symbol string — non-overlapping 'ab' occurrences are
    (len(s) - len(replace(s,'ab',''))) / 2, the same left-to-right
    greedy semantics CH uses.

    Scale: the event filter pushes to the scan; one groupBy shuffle
    carries (ts, event_id, 1-char symbol) triples; per-user state is
    the filtered symbol string (bounded by per-user activity). For
    adversarially long users, a segment-wise count (mapInPandas over
    ts-sorted chunks, carrying one boundary char) keeps state O(chunk).
    """
    e = table(spark, sf_dir, "events")
    f = e.filter(F.col("event_type").isin("view", "purchase"))
    sym = F.when(F.col("event_type") == "view", "a").otherwise("b")
    s = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", sym.alias("c")))),
            lambda x: x["c"],
        ),
        "",
    )
    g = f.groupBy("user_id").agg(s.alias("s"))
    n = (F.length("s") - F.length(F.replace(F.col("s"), F.lit("ab"), F.lit("")))) / 2
    return g.select(
        "user_id", n.cast("bigint").alias("n_matches")
    ).orderBy("user_id")


@query(
    "bitmap_state_merge",
    """
    WITH sh AS (
      SELECT event_type, user_id, COUNT(DISTINCT event_id % 4) AS u_shards
      FROM events GROUP BY event_type, user_id
    ),
    tot AS (
      SELECT event_type, COUNT(DISTINCT event_id % 4) AS n_shards
      FROM events GROUP BY event_type
    )
    SELECT t.event_type,
           CAST(t.n_shards AS BIGINT) AS n_shards,
           CAST(COUNT(*) AS BIGINT) AS or_cardinality,
           CAST(SUM(CASE WHEN s.u_shards = t.n_shards THEN 1 ELSE 0 END)
                AS BIGINT) AS and_cardinality
    FROM sh s JOIN tot t ON s.event_type = t.event_type
    GROUP BY t.event_type, t.n_shards ORDER BY t.event_type
    """,
)
def bitmap_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `groupBitmapState` / `groupBitmapOrMerge` /
    `groupBitmapAndMerge` parity: per (shard, event_type) the user-id
    set is materialized as MERGEABLE STATE (a sorted distinct array —
    the Spark-native stand-in for a roaring bitmap), then merged across
    shards per event_type with a union fold (OR) and an intersection
    fold (AND). Completes the -State/-Merge combinator family next to
    `uniq_state_merge` (HLL sketch), `agg_state_merge` (sums) and
    `topk_state_merge` (heavy hitters) with the set-algebra member.

    The oracle is derivation-INDEPENDENT: it computes OR as plain
    COUNT(DISTINCT user_id) and AND as users present in every shard —
    so a bug in the fold can't hide in a twin of itself.

    Scale: per-shard set state is bounded by per-shard distinct users;
    the merge shuffles n_shards rows per type, and the folds emit only
    cardinalities (order-independent, so collect_list's partition-
    arrival nondeterminism is immaterial). For set cardinalities where
    exact arrays blow past executor memory, the HLL path
    (`uniq_state_merge`) is the documented fallback; a production
    bitmap impl swaps the array state for roaring-serialized binary via
    the same two-level plan."""
    e = table(spark, sf_dir, "events")
    st = (
        e.withColumn("shard", F.col("event_id") % 4)
        .groupBy("shard", "event_type")
        .agg(F.array_sort(F.collect_set("user_id")).alias("bm"))
    )
    bms = F.collect_list("bm")
    empty = F.array().cast("array<bigint>")
    or_card = F.size(
        F.aggregate(bms, empty, lambda a, x: F.array_union(a, x))
    )
    and_card = F.size(
        F.aggregate(
            F.slice(bms, 2, F.greatest(F.size(bms) - 1, F.lit(0))),
            F.element_at(bms, 1),
            lambda a, x: F.array_intersect(a, x),
        )
    )
    return (
        st.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            or_card.cast("bigint").alias("or_cardinality"),
            and_card.cast("bigint").alias("and_cardinality"),
        )
        .orderBy("event_type")
    )


@query(
    "quantile_state_merge",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT day, CAST(n_events AS BIGINT) AS n_events,
           TRUE AS daily_p50_rank_ok,
           TRUE AS month_p50_rank_ok,
           TRUE AS month_p95_rank_ok
    FROM daily ORDER BY day
    """,
)
def quantile_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `quantileState` / `quantileMerge` parity: per-day KLL
    quantile sketches (Apache DataSketches via Spark's
    `kll_sketch_agg_double`) merged into a monthly sketch WITHOUT
    rescanning events — the quantile member of the -State/-Merge
    combinator family (`uniq_state_merge` HLL, `agg_state_merge` sums,
    `topk_state_merge` heavy hitters, `bitmap_state_merge` sets).

    Verification is in RANK space, where KLL's error guarantee lives
    (Spark's `kll_sketch_get_rank_*` only takes a foldable probe, so the
    check is inverted): read the estimated p50 VALUE out of each day's
    sketch and the p50/p95 out of the MERGED monthly sketch, then
    recompute each estimate's TRUE normalized rank exactly with a second
    aggregation pass — `avg(value <= est)` per day / per month — and
    gate it at the target rank +/- 0.05. KLL k=200 bounds rank error at
    ~1.65% (99% conf), so the gate has 3-sigma margin yet catches a
    broken merge outright. The oracle states the exact per-day counts
    and the TRUE gates (derivation-independent; floats never cross
    engines).

    Scale: one shuffle on day for the sketches; the monthly merge
    consumes |days| sketches of ~1-2 KB each — the rollup reads
    kilobytes regardless of corpus size, which is the entire point of
    mergeable quantile state at 100 TB. (The rank-recheck rescans events
    once more; that is the verification harness, not the operator.)"""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    q_of = lambda sk, p: F.call_function(  # noqa: E731
        "kll_sketch_get_quantile_double", sk, F.lit(p)
    )
    daily_est = daily.select(
        "day", "n_events", q_of(F.col("sk"), 0.5).alias("est_daily_p50")
    )
    merged = daily.agg(F.kll_merge_agg_double("sk").alias("msk")).select(
        q_of(F.col("msk"), 0.5).alias("est_m_p50"),
        q_of(F.col("msk"), 0.95).alias("est_m_p95"),
    )
    # second pass: the estimates' true normalized ranks, computed exactly
    frac_le = lambda est: F.avg(  # noqa: E731
        (F.col("value") <= est).cast("double")
    )
    rank_ok = lambda rank, target, tol=0.05: (  # noqa: E731
        F.abs(rank - F.lit(target)) <= tol
    )
    by_day = F.to_date("ts").alias("day")
    daily_ranks = (
        e.select(by_day, "value")
        .join(F.broadcast(daily_est), "day")
        .groupBy("day", "n_events")
        .agg(frac_le(F.col("est_daily_p50")).alias("r_daily"))
    )
    month_ranks = (
        e.select("value")
        .crossJoin(F.broadcast(merged))
        .agg(
            frac_le(F.col("est_m_p50")).alias("r_m50"),
            frac_le(F.col("est_m_p95")).alias("r_m95"),
        )
    )
    return (
        daily_ranks.crossJoin(F.broadcast(month_ranks))
        .select(
            "day",
            "n_events",
            rank_ok(F.col("r_daily"), 0.5).alias("daily_p50_rank_ok"),
            rank_ok(F.col("r_m50"), 0.5).alias("month_p50_rank_ok"),
            rank_ok(F.col("r_m95"), 0.95).alias("month_p95_rank_ok"),
        )
        .orderBy("day")
    )


@query(
    "theta_set_ops",
    """
    WITH flags AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p,
             MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_e
      FROM events WHERE event_type IN ('purchase', 'error')
      GROUP BY user_id
    )
    SELECT CAST(SUM(has_p) AS BIGINT) AS exact_purchase,
           CAST(SUM(has_e) AS BIGINT) AS exact_error,
           CAST(COUNT(*) AS BIGINT) AS exact_union,
           CAST(SUM(has_p * has_e) AS BIGINT) AS exact_both,
           CAST(SUM(has_p * (1 - has_e)) AS BIGINT) AS exact_purchase_only,
           TRUE AS union_within_5pct,
           TRUE AS intersect_within_5pct,
           TRUE AS diff_within_5pct
    FROM flags
    """,
)
def theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `uniqTheta` set-algebra parity: theta sketches support
    union AND intersection AND difference estimates (HLL only unions),
    which is what CH's `uniqTheta` + `groupBitmapAnd/Or/Xor` family is
    for. Purchasing users vs erroring users: |P u E|, |P n E|, |P \\ E|
    estimated from two per-segment sketches, gated within 5% of exact.

    The oracle computes the exact cardinalities from one per-user flag
    aggregation (derivation-independent of the sketch path). Zero-sized
    results (every purchaser also errored => P \\ E empty) gate on
    est = 0 exactly, since a ratio test divides by zero.

    Note the fixture honesty: at these SFs distinct users (<= 1500) sit
    under theta's k=4096 retained-hash cap, so the sketches are in
    exact mode and the 5% gates pass with zero slack consumed; at
    production cardinality the same plan degrades gracefully to ~2%
    relative error. Scale: each segment sketch is <= 64 KB regardless
    of corpus size; set algebra on sketch state replaces a
    multi-trillion-row distinct-join."""
    e = table(spark, sf_dir, "events")
    p_sk = e.filter(F.col("event_type") == "purchase").agg(
        F.theta_sketch_agg("user_id").alias("p_sk")
    )
    e_sk = e.filter(F.col("event_type") == "error").agg(
        F.theta_sketch_agg("user_id").alias("e_sk")
    )
    flags = (
        e.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("has_p"),
            F.max(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("has_e"),
        )
        .agg(
            F.sum("has_p").cast("bigint").alias("exact_purchase"),
            F.sum("has_e").cast("bigint").alias("exact_error"),
            F.count(F.lit(1)).cast("bigint").alias("exact_union"),
            F.sum(F.col("has_p") * F.col("has_e"))
            .cast("bigint")
            .alias("exact_both"),
            F.sum(F.col("has_p") * (1 - F.col("has_e")))
            .cast("bigint")
            .alias("exact_purchase_only"),
        )
    )
    est = lambda expr: F.theta_sketch_estimate(expr).cast("double")  # noqa: E731
    within = lambda est_c, exact_c: F.when(  # noqa: E731
        exact_c == 0, est_c == 0.0
    ).otherwise(F.abs(est_c / exact_c.cast("double") - 1.0) <= 0.05)
    return (
        flags.crossJoin(F.broadcast(p_sk))
        .crossJoin(F.broadcast(e_sk))
        .select(
            "exact_purchase",
            "exact_error",
            "exact_union",
            "exact_both",
            "exact_purchase_only",
            within(
                est(F.theta_union(F.col("p_sk"), F.col("e_sk"))),
                F.col("exact_union"),
            ).alias("union_within_5pct"),
            within(
                est(F.theta_intersection(F.col("p_sk"), F.col("e_sk"))),
                F.col("exact_both"),
            ).alias("intersect_within_5pct"),
            within(
                est(F.theta_difference(F.col("p_sk"), F.col("e_sk"))),
                F.col("exact_purchase_only"),
            ).alias("diff_within_5pct"),
        )
    )


@query(
    "uniq_sliding_window",
    """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    ex AS (
      SELECT d.day, COUNT(DISTINCT e.user_id) AS exact7
      FROM days d JOIN events e
        ON CAST(e.ts AS DATE) BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT day, CAST(exact7 AS BIGINT) AS exact7, TRUE AS within_5pct
    FROM ex ORDER BY day
    """,
)
def uniq_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users via WINDOWED SKETCH MERGE: the daily
    HLL sketches (the same mergeable state `uniq_state_merge` rolls up
    monthly) are unioned over a ROWS 6 PRECEDING frame — every rolling
    horizon comes from ONE pass over |days| kilobyte-sized states, where
    exact COUNT(DISTINCT) would re-scan each 7-day slice of the corpus
    (7x read amplification, growing with the horizon).

    The 5% gate vs the exact per-window count (computed independently
    by a day-range join on both engines) has the same ~6-sigma margin
    as `uniq_state_merge` (HLL lgK=12+ standard error under 1.6%).

    Scale: the window runs over the DAILY AGGREGATE — its single
    partition holds |days| sketch rows (metadata-sized at any corpus
    volume; days grow with calendar time, not data size), never events."""
    e = table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    daily = e.groupBy(day).agg(F.hll_sketch_agg("user_id").alias("sk"))
    # RANGE over epoch-day numbers, not ROWS over present days: with a
    # calendar gap a ROWS frame would reach >7 days back and overcount
    w = W.orderBy(F.unix_date(F.col("day"))).rangeBetween(-6, 0)
    est = daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est7"),
    )
    days = e.select(day).distinct()
    exact = (
        days.alias("d")
        .join(
            e.select(day, "user_id").alias("e"),
            F.col("e.day").between(
                F.date_sub(F.col("d.day"), 6), F.col("d.day")
            ),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact7"))
    )
    return (
        est.join(exact, "day")
        .select(
            "day",
            "exact7",
            (
                F.abs(
                    F.col("est7").cast("double")
                    / F.col("exact7").cast("double")
                    - 1.0
                )
                <= 0.05
            ).alias("within_5pct"),
        )
        .orderBy("day")
    )


@query(
    "heavy_hitters_weighted",
    """
    SELECT * FROM (
      SELECT l_returnflag, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS weight,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY SUM(CAST(l_quantity AS DECIMAL(30,4))) DESC, l_partkey
             ) AS rnk
      FROM lineitem GROUP BY l_returnflag, l_partkey) t
    WHERE rnk <= 5 ORDER BY l_returnflag, rnk
    """,
)
def heavy_hitters_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `topKWeighted(5)(part, weight)` analog, computed
    exactly: the heavy hitters ranked by SUMMED WEIGHT (quantity), not
    occurrence count — `heavy_hitters` is the count-based sibling. Same
    two-bounded-shuffle shape: per-(group, value) weight sums reduce
    map-side before the per-group rank window; decimal-exact weights
    with a key tiebreak make the top-5 deterministic on both engines.

    Scale: identical argument to `heavy_hitters` — the first aggregation
    collapses to |groups|x|values| rows before anything wide; the
    mergeable-sketch form for unbounded value domains is
    `topk_state_merge`."""
    l = table(spark, sf_dir, "lineitem")
    weights = l.groupBy("l_returnflag", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("w_dec")
    )
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("w_dec").desc(), F.col("l_partkey")
    )
    return (
        weights.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "l_returnflag",
            "l_partkey",
            F.col("w_dec").cast("double").alias("weight"),
            "rnk",
        )
        .orderBy("l_returnflag", "rnk")
    )


@query(
    "mad_outlier_scores",
    """
    WITH med AS (
      SELECT event_type, ROUND(quantile_cont(value, 0.5), 9) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, med, ROUND(quantile_cont(adev, 0.5), 9) AS mad
      FROM dev GROUP BY event_type, med
    )
    SELECT d.event_type,
           m.med,
           m.mad,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN abs(d.value - m.med) > 3 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, m.med, m.mad
    ORDER BY d.event_type
    """,
)
def mad_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier scoring via MEDIAN ABSOLUTE DEVIATION: per event
    type, median and MAD of `value`, and the count of |v - med| > 3-MAD
    outliers — the robust alternative to z-scores (`agg_stats`' stddev
    is dragged by the outliers it is supposed to find; the median pair
    is not). Medians pass through the ROUND(,9) ulp-absorber
    `median_exact` established, so the outlier SET — a strict float
    comparison against 3*mad — is engine-identical, not just the
    summary stats.

    Scale: two grouped exact medians (group values co-located — the
    honest exactness cost, sketchable via `quantile_state_merge`'s KLL
    at corpus scale) plus one broadcast of the |types|-row median/MAD
    table back across events; no corpus self-join."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 9).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 9).alias("mad")
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "user_churn_weekly",
    """
    WITH presence AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(week) AS first_week FROM presence GROUP BY user_id
    ),
    flags AS (
      SELECT p.user_id, p.week,
             CASE WHEN p.week = f.first_week THEN 1 ELSE 0 END AS is_new,
             CASE WHEN EXISTS (
               SELECT 1 FROM presence q
               WHERE q.user_id = p.user_id
                 AND q.week = p.week - INTERVAL 7 DAY
             ) THEN 1 ELSE 0 END AS was_active_prev
      FROM presence p JOIN firsts f ON p.user_id = f.user_id
    ),
    churn AS (
      SELECT week + INTERVAL 7 DAY AS week, user_id
      FROM flags
      WHERE NOT EXISTS (
        SELECT 1 FROM presence q
        WHERE q.user_id = flags.user_id
          AND q.week = flags.week + INTERVAL 7 DAY
      )
    )
    SELECT f.week,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(SUM(f.is_new) AS BIGINT) AS new_users,
           CAST(SUM(f.was_active_prev) AS BIGINT) AS retained_users,
           CAST((SELECT COUNT(*) FROM churn c
                 WHERE CAST(c.week AS DATE) = f.week) AS BIGINT)
             AS churned_in
    FROM flags f
    GROUP BY f.week
    ORDER BY f.week
    """,
)
def user_churn_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active/new/retained/churned user accounting — the growth
    dashboard's four numbers. Churned-in(w) counts users active in week
    w-1 who did not return in w; new = first-ever week; retained =
    active in both w-1 and w. Exact set logic via one per-(user, week)
    presence table self-joined on the adjacent week — never a per-week
    rescan of raw events, and the distinct presence rows (|users| x
    |weeks| upper bound) are the ONLY thing that shuffles.

    At corpus scale the same numbers come from the mergeable sketch
    path: `theta_set_ops`' week-over-week difference estimates on
    per-week theta sketches, reading KB-sized state instead of the
    presence table — this operator is the exact auditor for it."""
    e = table(spark, sf_dir, "events")
    presence = e.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
    ).distinct()
    firsts = presence.groupBy("user_id").agg(F.min("week").alias("first_week"))
    prev = presence.select(
        F.col("user_id").alias("p_user"),
        F.date_add(F.col("week"), 7).alias("next_week"),
    )
    flags = (
        presence.join(firsts, "user_id")
        .join(
            prev,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("week") == F.col("next_week")),
            "left",
        )
        .select(
            "user_id",
            "week",
            F.when(F.col("week") == F.col("first_week"), 1)
            .otherwise(0)
            .alias("is_new"),
            F.when(F.col("next_week").isNotNull(), 1).otherwise(0).alias(
                "was_active_prev"
            ),
        )
    )
    nxt = presence.select(
        F.col("user_id").alias("n_user"), F.col("week").alias("n_week")
    )
    churned = (
        presence.join(
            nxt,
            (F.col("user_id") == F.col("n_user"))
            & (F.date_add(F.col("week"), 7) == F.col("n_week")),
            "left_anti",
        )
        .select(F.date_add(F.col("week"), 7).alias("week"))
        .groupBy("week")
        .agg(F.count(F.lit(1)).cast("bigint").alias("churned_in"))
    )
    out = (
        flags.groupBy("week")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.sum("is_new").cast("bigint").alias("new_users"),
            F.sum("was_active_prev").cast("bigint").alias("retained_users"),
        )
        .join(churned, "week", "left")
        .select(
            "week",
            "active_users",
            "new_users",
            "retained_users",
            F.coalesce(F.col("churned_in"), F.lit(0))
            .cast("bigint")
            .alias("churned_in"),
        )
        .orderBy("week")
    )
    return out


# OHLC time bars (the ClickHouse/time-series classic: candlestick
# downsampling). Open/close need an ORDER the aggregate can see: Spark's
# min_by/max_by accept a STRUCT ordering key, so the whole bar is ONE
# aggregate pass ordered by (ts, event_id); DuckDB's arg_min/arg_max do
# not take composite keys, so the oracle states the same semantics as a
# two-level aggregate (collapse same-ts ties by event_id, then pick bar
# endpoints by ts).
@query(
    "ohlc_bars",
    f"""
    WITH per_ts AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_hour, ts,
             arg_min(value, event_id) AS open_rep,
             arg_max(value, event_id) AS close_rep,
             MIN(value) AS lo, MAX(value) AS hi,
             COUNT(*) AS n, {sql_dec_sum('value')} AS vol
      FROM events
      GROUP BY event_type, bar_hour, ts)
    SELECT event_type, bar_hour,
           arg_min(open_rep, ts) AS open,
           MAX(hi) AS high,
           MIN(lo) AS low,
           arg_max(close_rep, ts) AS close,
           CAST(SUM(n) AS BIGINT) AS n_events,
           {sql_dec_sum('vol')} AS volume
    FROM per_ts
    GROUP BY event_type, bar_hour
    ORDER BY event_type, bar_hour
    """,
)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candlestick bars per event type: open/close = value
    of the first/last event in the bar ordered by (ts, event_id),
    high/low = extremes, plus event count and decimal-exact volume.

    Scale posture: ONE grouped exchange on (event_type, bar_hour) — the
    struct-ordered min_by/max_by carry a single (value, (ts, event_id))
    pair per group through the map-side partials, never a sorted
    buffer, so the pass is a plain partial-aggregable hash aggregate.
    (A two-level rollup — the oracle's spelling — would cost a second
    exchange: hash partitioning on (type, hour, ts) does NOT satisfy a
    (type, hour) requirement, unlike range partitioning prefixes.)
    Bars scale with calendar time x types, not event volume."""
    e = table(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("bar_hour"),
            "ts",
            "event_id",
            "value",
        )
        .groupBy("event_type", "bar_hour")
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dec_sum("value").alias("volume"),
        )
        .orderBy("event_type", "bar_hour")
    )
