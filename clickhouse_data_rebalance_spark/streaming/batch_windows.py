"""Time-window aggregations over `events` (SURVEY.md C48–C50), batch
form — `window()` / `session_window()` produce identical results in
batch and streaming, so these carry full SQL oracles; the streaming
execution of the same plans lives in `stream_ops.py` (tested
batch≡stream in tests/).

DuckDB twins: tumbling → time_bucket; sliding → generate_series join;
session → gaps-and-islands (SURVEY.md §2.3 C-IV).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import table
from ..operators._util import dec_sum, sql_dec_avg, sql_dec_sum


@query(
    "tumbling_window_agg",
    f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dec_sum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )


@query(
    "sliding_window_agg",
    f"""
    WITH starts AS (
      SELECT unnest(generate_series(
               TIMESTAMP '2023-12-31 23:15:00',
               TIMESTAMP '2024-01-31 00:00:00',
               INTERVAL '15 minutes')) AS win_start
    )
    SELECT s.win_start,
           COUNT(*) AS n_events,
           {sql_dec_sum('e.value')} AS total_value
    FROM events e JOIN starts s
      ON e.ts >= s.win_start AND e.ts < s.win_start + INTERVAL '1 hour'
    GROUP BY s.win_start
    ORDER BY s.win_start
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 min. Spark emits each event into 4
    windows; the oracle reproduces that with a generate_series range join
    (only non-empty windows appear on both sides)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "total_value")
        .orderBy("win_start")
    )


@query(
    "session_window_agg",
    f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           {sql_dec_sum('value')} AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C50: 30-min-gap sessionization via session_window; oracle is the
    classic gaps-and-islands rewrite (session_end = last event + gap,
    matching Spark's window.end)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "time_gap_fill",
    f"""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hr FROM bounds
    ), hourly AS (
      SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS n,
             {sql_dec_sum('value')} AS total
      FROM events GROUP BY 1
    )
    SELECT s.hr, COALESCE(h.n, 0) AS n, COALESCE(h.total, 0.0) AS total
    FROM spine s LEFT JOIN hourly h ON s.hr = h.hr
    ORDER BY s.hr
    """,
)
def time_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time series with zero-filled gaps (ClickHouse ORDER BY ...
    WITH FILL analog): an hourly spine generated from the data's own
    bounds, left-joined to the hourly rollup. The spine is one row per
    hour — broadcastable at any scale; the rollup is the only shuffle."""
    e = table(spark, sf_dir, "events")
    spine = (
        e.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
        )
    )
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("value").alias("total"))
    )
    return (
        F.broadcast(spine)
        .join(hourly, "hr", "left")
        .select(
            "hr",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
        .orderBy("hr")
    )


@query(
    "time_gap_fill_interpolate",
    f"""
    WITH ev AS (SELECT * FROM events WHERE user_id < 5),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM ev
    ), hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hr FROM bounds
    ), spine AS (
      SELECT u.user_id, h.hr
      FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN hours h
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             {sql_dec_avg('value')} AS v
      FROM ev GROUP BY 1, 2
    ), joined AS (
      SELECT s.user_id, s.hr, h.v
      FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr
    ), ctx AS (
      SELECT user_id, hr, v,
             last_value(v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
               OVER w_prev AS ph,
             first_value(v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
               OVER w_next AS nh
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY hr
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, hr,
           CAST(floor(
             CASE
               WHEN v IS NOT NULL THEN v
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               ELSE pv + (nv - pv) * ((epoch(hr) - epoch(ph))
                                      / (epoch(nh) - epoch(ph)))
             END * 1073741824.0) AS BIGINT) AS v_fp30,
           CAST(v IS NULL AS INT) AS filled
    FROM ctx ORDER BY user_id, hr
    """,
)
def time_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill with LINEAR INTERPOLATION (ClickHouse ``WITH FILL ...
    INTERPOLATE`` analog): each user's hourly average series is
    densified on the hour spine and missing hours take the straight line
    between the surrounding known points (edges extend the nearest known
    value). The two direction-scans are window fills over ONE user_id
    partitioning; output is fixed-point (floor at 2^30) since both
    engines evaluate the identical arithmetic on identical doubles.

    Scale: the spine is |users-in-scope| x |hours| — generated, not
    shuffled; the only data shuffle is the hourly rollup, and both
    window passes reuse its user partitioning."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    hours = (
        e.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
        )
    )
    spine = e.select("user_id").distinct().crossJoin(F.broadcast(hours))
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg((dec_sum("value") / F.count(F.lit(1))).alias("v"))
    joined = spine.join(hourly, ["user_id", "hr"], "left")

    w_prev = (
        W.partitionBy("user_id").orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("user_id").orderBy("hr")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    known_hr = F.when(F.col("v").isNotNull(), F.col("hr"))
    ctx = (
        joined.withColumn("pv", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn("ph", F.last(known_hr, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("v", ignorenulls=True).over(w_next))
        .withColumn("nh", F.first(known_hr, ignorenulls=True).over(w_next))
    )
    ep = lambda c: F.col(c).cast("double")  # noqa: E731 — epoch seconds
    frac = (ep("hr") - ep("ph")) / (ep("nh") - ep("ph"))
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return ctx.select(
        "user_id",
        "hr",
        F.floor(filled * 1073741824.0).cast("bigint").alias("v_fp30"),
        F.col("v").isNull().cast("int").alias("filled"),
    ).orderBy("user_id", "hr")


@query(
    "funnel_conversion",
    """
    WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    converted AS (
      SELECT DISTINCT c.user_id
      FROM c JOIN p ON c.user_id = p.user_id
       AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM c) AS step1_users,
           (SELECT COUNT(*) FROM converted) AS step2_users
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (ClickHouse windowFunnel analog): users who
    purchased within 1 hour of a click. The join is equi on user_id with
    the time window as a ride-along predicate — per-user row counts bound
    the pair blowup, never a cross join."""
    e = table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("c_ts"))
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    converted = (
        c.join(p, "user_id")
        .filter(
            (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("user_id")
        .distinct()
    )
    return c.agg(F.countDistinct("user_id").alias("step1_users")).crossJoin(
        converted.agg(F.count(F.lit(1)).alias("step2_users"))
    )
