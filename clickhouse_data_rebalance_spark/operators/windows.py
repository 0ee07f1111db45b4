"""Window functions (SURVEY.md §2 C15–C17) + sort/limit/top-k (C18–C20).

Windows partition by a key and sort *totally* (unique tiebreaker column
in every ORDER BY) so rank/lag results are deterministic across engines.
Top-k-per-group is the window-rank pattern — distributed, no driver-side
sort (the 100 TB-safe formulation; a global orderBy().limit() is only
used for small final results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import query
from ..tables import table

# running-sum inputs go through decimal so the frame accumulation is exact
_DEC = "decimal(30,4)"


@query(
    "window_ranking",
    """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS drnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    ws = W.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(ws).alias("rnk"),
        F.dense_rank().over(ws).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_analytic",
    f"""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           CAST(SUM(CAST(o_totalprice AS {_DEC})) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16 analytic windows; running_spend adds an explicit-frame
    accumulation so this also represents C17 (window_frames stays
    registered as the dedicated moving-frame variant)."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.sum(F.col("o_totalprice").cast(_DEC)).over(run).cast("double").alias(
            "running_spend"
        ),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_frames",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS {_DEC})) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           CAST(SUM(CAST(o_totalprice AS {_DEC})) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) /
           COUNT(*) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3,
           COUNT(*) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = w.rowsBetween(-2, W.currentRow)
    price_dec = F.col("o_totalprice").cast(_DEC)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price_dec).over(run).cast("double").alias("running_spend"),
        (F.sum(price_dec).over(mov).cast("double") / F.count(F.lit(1)).over(mov)).alias(
            "moving_avg3"
        ),
        F.count(F.lit(1)).over(run).alias("n_so_far"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_range_interval",
    f"""
    SELECT user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS {_DEC})) OVER w AS DOUBLE) AS value_last_hour
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts
    """,
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event TIME (not row position): each event's
    trailing 1-hour activity — the moving-window shape rate limiting,
    anomaly scoring, and sliding feature extraction need, where a ROWS
    frame is wrong whenever events arrive unevenly.

    Spark's rangeBetween needs a numeric ordering column, so ts is cast
    to MICROSECOND epoch — the fixtures carry sub-second timestamps, so
    ordering by whole seconds would merge distinct-µs peers and clip the
    1-hour lower bound, diverging from the oracle's microsecond-exact
    RANGE INTERVAL frame. One shuffle on user_id; the frame scan is
    O(events-in-window) per row. Ties on the full (user_id, ts) are
    absorbed: RANGE frames include ALL peers of the current ts on both
    engines."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    # NTZ -> LTZ cast is value-preserving under the pinned UTC session tz
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy(epoch).rangeBetween(-3600 * 10**6, 0)
    return (
        e.select(
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_last_hour"),
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("value_last_hour"),
        )
        .orderBy("user_id", "ts")
    )


@query(
    "sort_multi_key",
    """
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_nationkey DESC, s_acctbal ASC NULLS FIRST, s_suppkey
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    return s.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal").orderBy(
        F.col("s_nationkey").desc(),
        F.col("s_acctbal").asc_nulls_first(),
        F.col("s_suppkey"),
    )


@query(
    "top_k",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-25
    # then a k-sized driver merge — no global sort, scale-safe. The
    # mixed-direction multi-key ORDER BY doubles as the C18 sort
    # representative (sort_multi_key stays as the full-sort variant).
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.col("o_orderstatus").asc(), F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "top_k_per_group",
    """
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 3
    ORDER BY c_nationkey, rn
    """,
)
def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed top-k per group: one shuffle on the group key, rank, filter
    # (REPOSE-style pattern, PAPERS.md) — never collects a global sort.
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    )


@query(
    "window_distribution",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume,
           ROUND(CAST(o_totalprice AS DOUBLE)
                 / CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER p
                        AS DOUBLE), 9) AS share_of_cust
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
           p AS (PARTITION BY o_custkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15 completion: distribution window functions — percent_rank,
    cume_dist, and ratio-to-report (each order's share of its customer's
    total spend).

    The share denominator accumulates through DECIMAL so the partition
    sum is order-independent and exact in both engines; the final
    division is one double op on identical operands. ORDER BY carries the
    unique o_orderkey tiebreaker so ranks are total.

    Scale: one hash partitioning on o_custkey serves all three windows
    (same partition key); no global sort beyond presentation."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    p = W.partitionBy("o_custkey")
    share = F.col("o_totalprice").cast("double") / F.sum(
        F.col("o_totalprice").cast(_DEC)
    ).over(p).cast("double")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.round(share, 9).alias("share_of_cust"),
    ).orderBy("o_custkey", "o_orderkey")
