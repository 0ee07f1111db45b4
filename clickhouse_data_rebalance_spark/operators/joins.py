"""Joins (SURVEY.md §2 C4–C9): inner / outer / semi / anti / theta / cross
plus an explicitly broadcast dimension join.

Scale notes (100 TB posture):
- Fact⋈fact joins (lineitem⋈orders) shuffle on the join key — that's the
  right plan; AQE handles skew splitting.
- Dimension joins (nation, region — fixed 25/5 rows at ANY scale) are
  broadcast explicitly so no shuffle of the fact side ever happens.
- The pure-theta join is restricted to tiny dimension inputs (nation²);
  at scale a theta join without an equi component is a cross product —
  the API deliberately only exposes it over bounded inputs.

Reference parity: the reference has no joins (SURVEY.md §2.4) — this is
Tier C surface making the rebalanced data queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import table
from ._util import dec_sum, sql_dec_sum


@query(
    "join_inner",
    f"""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderstatus,
           {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
           COUNT(*) AS n_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
    ORDER BY o.o_orderkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .join(l, o.o_orderkey == l.l_orderkey, "inner")
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(dec_sum(revenue, 6).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("o_orderkey")
    )


@query(
    "join_broadcast_dims",
    f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers,
           {sql_dec_sum('c.c_acctbal')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("c_acctbal").alias("total_acctbal"),
        )
        .orderBy("region", "nation")
    )


@query(
    "join_left_outer",
    """
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "join_right_outer",
    """
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM orders o RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5's right-outer variant (orders RIGHT JOIN customer — every
    customer survives, orderless ones count 0). Same preserved-side
    semantics as join_left_outer, so the two must agree row-for-row;
    Spark plans both as the identical shuffled hash join with the
    preserved side on the build-appropriate end."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(c, c.c_custkey == o.o_custkey, "right")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "join_full_outer",
    """
    SELECT COALESCE(cs.nk, ss.nk) AS nationkey,
           COALESCE(cs.n_cust, 0) AS n_cust,
           COALESCE(ss.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cs
    FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) ss
      ON cs.nk = ss.nk
    ORDER BY nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cs = c.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    ss = s.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        cs.join(ss, "nk", "full")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_theta_range",
    """
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, p.p_retailprice, l.l_extendedprice
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey
     AND l.l_extendedprice > p.p_retailprice * 40
    ORDER BY l.l_orderkey, l.l_linenumber
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # equi component keeps this a hash/sort-merge join; the range predicate
    # rides along as a post-join filter — scale-safe.
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        l.join(
            p,
            (l.l_partkey == p.p_partkey)
            & (l.l_extendedprice > p.p_retailprice * 40),
        )
        .select("l_orderkey", "l_linenumber", "p_partkey", "p_retailprice", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "join_theta_pure",
    """
    SELECT a.n_name AS n1, b.n_name AS n2
    FROM nation a JOIN nation b ON a.n_regionkey < b.n_regionkey
    ORDER BY n1, n2
    """,
)
def join_theta_pure(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pure theta (no equi key) — bounded-input only: nation is 25 rows at
    # any scale, so the nested-loop product is trivially safe.
    n = table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return (
        a.join(b, F.col("a.n_regionkey") < F.col("b.n_regionkey"))
        .select(F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2"))
        .orderBy("n1", "n2")
    )


@query(
    "join_null_safe",
    """
    WITH a AS (SELECT n_nationkey, n_name, NULLIF(n_regionkey, 0) AS rk FROM nation),
         b AS (SELECT r_regionkey, r_name, NULLIF(r_regionkey, 0) AS rk FROM region)
    SELECT a.n_nationkey, a.n_name, b.r_name
    FROM a JOIN b ON a.rk IS NOT DISTINCT FROM b.rk
    ORDER BY a.n_nationkey
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (Spark ``<=>`` / SQL IS NOT DISTINCT FROM):
    NULL keys MATCH each other instead of vanishing — the semantics
    change-data and SCD pipelines rely on when the join key is nullable
    (a plain equi-join silently drops every NULL-keyed row). Keys here
    are made nullable with NULLIF so both arms are exercised: region 0
    rows pair through NULL<=>NULL, the rest through normal equality.

    Scale: ``<=>`` stays a hash-joinable equi-condition (NULLs hash to
    one partition — salt if a nullable key is null-heavy)."""
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", F.nullif("n_regionkey", F.lit(0)).alias("rk")
    )
    r = table(spark, sf_dir, "region").select(
        "r_name", F.nullif("r_regionkey", F.lit(0)).alias("rk")
    )
    return (
        n.join(r, n["rk"].eqNullSafe(r["rk"]))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    )


@query(
    "join_cross",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    ORDER BY r.r_name, n.n_name
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@query(
    "asof_join",
    """
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           c.ts AS click_ts, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, arg_max(value, event_id) AS value
                    FROM events WHERE event_type = 'click'
                    GROUP BY user_id, ts) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (the brief's canonical custom operator; ClickHouse ASOF
    JOIN): each purchase matched to the user's most recent click at or
    before it. Spark lacks the operator — the scale-correct composition is
    union both sides + window last(ignorenulls) fill: ONE shuffle on
    (user, ts), no range-join row blowup. Oracle: DuckDB's native ASOF.

    Determinism: two clicks by one user can share an identical ts, and
    neither window-last nor native ASOF specifies which wins — so both
    engines first collapse clicks to one row per (user_id, ts) with an
    arg_max(value, event_id) tiebreak (map-side-combined agg, same
    user_id shuffle key the window reuses)."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(None).cast("double").alias("c_val"),
        F.lit(1).alias("is_p"),
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("event_id"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_val"),
            F.lit(0).alias("is_p"),
        )
    )
    # at equal ts the click sorts first (is_p asc) → '>=' semantics
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = (
        p.unionByName(c)
        .withColumn("click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .withColumn("click_value", F.last("c_val", ignorenulls=True).over(w))
    )
    return (
        filled.filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "click_ts",
            "click_value",
        )
        .orderBy("event_id")
    )


@query(
    "asof_join_forward",
    """
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           c.ts AS next_click_ts, c.value AS next_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, arg_max(value, event_id) AS value
                    FROM events WHERE event_type = 'click'
                    GROUP BY user_id, ts) c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    ORDER BY p.event_id
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-direction as-of join (pandas merge_asof
    ``direction='forward'``): each purchase matched to the user's
    EARLIEST click at or after it — the "next action after conversion"
    shape. Mirror composition of `asof_join`: union both sides + window
    first(ignorenulls) over the FOLLOWING frame, one shuffle on
    (user_id, ts); at equal ts the purchase sorts first (is_p desc) so
    a same-instant click matches ('<=' semantics). Same deterministic
    (user_id, ts) click collapse. Oracle: DuckDB native forward ASOF."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(None).cast("double").alias("c_val"),
        F.lit(1).alias("is_p"),
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("event_id"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_val"),
            F.lit(0).alias("is_p"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_p").desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    filled = (
        p.unionByName(c)
        .withColumn("next_click_ts", F.first("c_ts", ignorenulls=True).over(w))
        .withColumn("next_click_value", F.first("c_val", ignorenulls=True).over(w))
    )
    return (
        filled.filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "next_click_ts",
            "next_click_value",
        )
        .orderBy("event_id")
    )


@query(
    "asof_join_tolerance",
    """
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.ts END AS click_ts,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.value END AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, arg_max(value, event_id) AS value
                    FROM events WHERE event_type = 'click'
                    GROUP BY user_id, ts) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas merge_asof's
    ``tolerance=``, kdb wj's window): the most recent click counts only
    if it is within 1 hour of the purchase — stale matches become NULL
    instead of silently attributing a day-old click.

    Same single-shuffle union + window-fill composition as `asof_join`,
    including its (user_id, ts) click collapse with the
    arg_max(value, event_id) tiebreak — same-ts clicks would otherwise
    be picked nondeterministically by both window-last and native ASOF.
    The nearest preceding match IS the window-fill result, so the
    tolerance is a row-local post-predicate — no extra shuffle, no
    range-join blowup. Oracle: DuckDB native ASOF with the same CASE."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(None).cast("double").alias("c_val"),
        F.lit(1).alias("is_p"),
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("event_id"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_val"),
            F.lit(0).alias("is_p"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    in_tol = F.col("raw_click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    filled = (
        p.unionByName(c)
        .withColumn("raw_click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .withColumn("raw_click_value", F.last("c_val", ignorenulls=True).over(w))
        .withColumn("click_ts", F.when(in_tol, F.col("raw_click_ts")))
        .withColumn("click_value", F.when(in_tol, F.col("raw_click_value")))
    )
    return (
        filled.filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "click_ts",
            "click_value",
        )
        .orderBy("event_id")
    )


@query(
    "asof_join_nearest",
    """
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           n.ts AS click_ts, n.value AS click_value,
           CASE WHEN n.ts IS NULL THEN NULL
                WHEN n.ts <= p.ts THEN 'back' ELSE 'fwd' END AS side
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT c.ts, c.value
      FROM (SELECT user_id, ts, arg_max(value, event_id) AS value
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, ts) c
      WHERE c.user_id = p.user_id
      ORDER BY abs(epoch(c.ts) - epoch(p.ts)), c.ts
      LIMIT 1) n ON TRUE
    ORDER BY p.event_id
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join (pandas merge_asof
    ``direction='nearest'``): each purchase matched to the click closest
    in time in EITHER direction, ties going to the earlier click. The
    oracle states the semantics independently as a DuckDB lateral
    min-by-|distance| probe over all of the user's clicks.

    Composition: the same single-shuffle union as `asof_join`, with TWO
    window fills over the one (user_id, ts, is_p) sort — last-ignorenulls
    looking back, first-ignorenulls looking forward — then a row-local
    pick of the nearer side. An equal-ts click sorts before the purchase
    (is_p ascending), so it is captured by the backward fill at distance
    zero, which also makes the back-side tie-preference the earlier-click
    rule the oracle states. Same-ts clicks collapse via
    arg_max(value, event_id) first, as in the whole asof family.

    Scale posture: ONE exchange on user_id shared by the collapse, both
    window fills, and the pick (all partition by the same key); no
    range-join candidate blowup, no second shuffle — `.explain` shows a
    single Exchange feeding two Window operators back-to-back."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(None).cast("double").alias("c_val"),
        F.lit(1).alias("is_p"),
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("event_id"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_val"),
            F.lit(0).alias("is_p"),
        )
    )
    base = W.partitionBy("user_id").orderBy("ts", "is_p")
    w_back = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_fwd = base.rowsBetween(W.currentRow, W.unboundedFollowing)
    # timestamp subtraction yields a day-time INTERVAL, which is totally
    # ordered — distances compare exactly with no epoch-double cast
    # (TIMESTAMP_NTZ refuses numeric casts outright)
    d_back = F.col("ts") - F.col("back_ts")
    d_fwd = F.col("fwd_ts") - F.col("ts")
    pick_back = F.col("fwd_ts").isNull() | (
        F.col("back_ts").isNotNull() & (d_back <= d_fwd)
    )
    filled = (
        p.unionByName(c)
        .withColumn("back_ts", F.last("c_ts", ignorenulls=True).over(w_back))
        .withColumn("back_val", F.last("c_val", ignorenulls=True).over(w_back))
        .withColumn("fwd_ts", F.first("c_ts", ignorenulls=True).over(w_fwd))
        .withColumn("fwd_val", F.first("c_val", ignorenulls=True).over(w_fwd))
    )
    return (
        filled.filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.when(pick_back, F.col("back_ts"))
            .otherwise(F.col("fwd_ts"))
            .alias("click_ts"),
            F.when(pick_back, F.col("back_val"))
            .otherwise(F.col("fwd_val"))
            .alias("click_value"),
            F.when(F.col("back_ts").isNull() & F.col("fwd_ts").isNull(), F.lit(None))
            .when(pick_back, F.lit("back"))
            .otherwise(F.lit("fwd"))
            .alias("side"),
        )
        .orderBy("event_id")
    )
