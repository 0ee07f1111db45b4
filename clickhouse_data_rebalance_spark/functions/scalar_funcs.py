"""Scalar function surface (SURVEY.md §2 C26–C31): string, date/time,
math, array (higher-order), map, and JSON functions — all JVM-side
`pyspark.sql.functions` (whole-stage-codegen'd; no Python in the row path).

Cross-engine notes baked into the oracles:
- datediff: Spark is (end, start); DuckDB is ('day', start, end).
- pmod: DuckDB lacks it → ((a % b) + b) % b.
- float arrays are cast to double before arithmetic so Spark (float32
  kernels) and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import table


@query(
    "string_funcs",
    """
    SELECT c_custkey,
           UPPER(c_name) AS up, LOWER(c_mktsegment) AS lo,
           SUBSTRING(c_name, 1, 8) AS sub8,
           LENGTH(c_name) AS len,
           CONCAT(c_name, '#', c_mktsegment) AS joined,
           TRIM('  pad  ') AS trimmed,
           REPLACE(c_name, 'Customer', 'Cust') AS repl,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devowel,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           REVERSE(c_mktsegment) AS rev,
           CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has1
    FROM customer ORDER BY c_custkey
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.length("c_name").alias("len"),
        F.concat_ws("#", "c_name", "c_mktsegment").alias("joined"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("devowel"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has1"),
    ).orderBy("c_custkey")


@query(
    "datetime_funcs",
    """
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           EXTRACT(day FROM o_orderdate) AS dy,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS plus30,
           epoch(o_orderdate) AS epoch_s,
           CAST(o_orderdate AS DATE) AS just_date,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders ORDER BY o_orderkey
    """,
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dy"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_y2k"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAYS"))
        .cast("timestamp")
        .alias("plus30"),
        F.unix_timestamp("o_orderdate").cast("double").alias("epoch_s"),
        F.col("o_orderdate").cast("date").alias("just_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    ).orderBy("o_orderkey")


@query(
    "math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS r1,
           FLOOR(l_extendedprice) AS flr,
           CEIL(l_extendedprice) AS cl,
           ABS(l_discount - 0.05) AS absd,
           POW(l_quantity, 2) AS qty_sq,
           SQRT(l_quantity) AS qty_sqrt,
           ROUND(LN(l_extendedprice), 9) AS lnp,
           ROUND(LOG10(l_extendedprice), 9) AS log10p,
           ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS pm7,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sgn,
           GREATEST(l_quantity, 25.0) AS gq,
           LEAST(l_quantity, 25.0) AS lq
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor("l_extendedprice").cast("double").alias("flr"),
        F.ceil("l_extendedprice").cast("double").alias("cl"),
        F.abs(F.col("l_discount") - 0.05).alias("absd"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        # round: libm vs JVM ln differ in the last ulp
        F.round(F.log(F.col("l_extendedprice")), 9).alias("lnp"),
        F.round(F.log10("l_extendedprice"), 9).alias("log10p"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("pm7"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.greatest("l_quantity", F.lit(25.0)).alias("gq"),
        F.least("l_quantity", F.lit(25.0)).alias("lq"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "array_funcs",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[64] AS DOUBLE) AS last_val,
           array_to_string(list_transform(embedding[1:4],
             x -> CAST(CAST(CAST(x AS DOUBLE) * 2.0 AS DECIMAL(30,9))
                       AS VARCHAR)), ',') AS first4_x2,
           CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE)
             AS vec_sum,
           array_to_string(list_transform(
             list_sort(list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))),
             x -> CAST(CAST(x AS DECIMAL(30,9)) AS VARCHAR)), ',')
             AS first3_sorted,
           list_contains(list_transform(embedding, x -> CAST(x AS DOUBLE) > 0.2), true)
             AS any_big
    FROM embeddings ORDER BY vec_id
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
        # double arrays serialized to decimal(30,9)-element CSV strings
        # (oracle mirrors with array_to_string): the driver's pandas
        # canonicalizer cannot sort LIST columns, and fixed-point
        # strings also absorb double-repr divergence between engines
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: (x.cast("double") * 2.0)
                .cast("decimal(30,9)")
                .cast("string"),
            ),
            ",",
        ).alias("first4_x2"),
        F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x).alias("vec_sum"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.transform(
                        F.slice("embedding", 1, 3), lambda x: x.cast("double")
                    )
                ),
                lambda x: x.cast("decimal(30,9)").cast("string"),
            ),
            ",",
        ).alias("first3_sorted"),
        F.array_contains(
            F.transform(F.col("embedding"), lambda x: x.cast("double") > 0.2), True
        ).alias("any_big"),
    ).orderBy("vec_id")


@query(
    "explode_words",
    """
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id, word
    """,
)
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .orderBy("doc_id", "word")
    )


@query(
    "posexplode_words",
    """
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents
    WHERE doc_id < 20
    ORDER BY doc_id, pos
    """,
)
def posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "word")
        .orderBy("doc_id", "pos")
    )


@query(
    "json_funcs",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CASE WHEN json_extract_string(props, '$.missing') IS NULL
                THEN 1 ELSE 0 END AS missing_is_null
    FROM events ORDER BY event_id
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.when(F.get_json_object("props", "$.missing").isNull(), 1).otherwise(0).alias(
            "missing_is_null"
        ),
    ).orderBy("event_id")


@query(
    "map_funcs",
    """
    SELECT event_id,
           json_keys(props)[1] AS first_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           len(json_keys(props)) AS n_keys
    FROM events ORDER BY event_id
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MapType arises from from_json over the props JSON string (C30);
    # output scalars (not raw maps) so both engines hash identically.
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, F.lit("k")).alias("k_val"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Suite queries: one row per function family, used as the driver-facing
# §2 representatives (the per-family queries above stay registered as the
# dedicated variants). One projection over a single table keeps each suite
# a pure codegen map stage.
# --------------------------------------------------------------------------


@query(
    "scalar_funcs_suite",
    """
    SELECT o_orderkey,
           UPPER(o_orderpriority) AS up, LOWER(o_orderstatus) AS lo,
           SUBSTRING(o_orderpriority, 3, 6) AS subp,
           LENGTH(o_orderpriority) AS plen,
           CONCAT(o_orderstatus, '#', o_orderpriority) AS joined,
           regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_num,
           LPAD(CAST(o_orderkey AS VARCHAR), 10, '0') AS padded,
           REVERSE(o_orderpriority) AS rev,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           strftime(o_orderdate, '%Y-%m') AS ym,
           ROUND(o_totalprice, 1) AS r1,
           FLOOR(o_totalprice) AS flr,
           ABS(o_totalprice - 100000.0) AS absd,
           SQRT(o_totalprice) AS sq,
           ROUND(LN(o_totalprice), 9) AS lnp,
           ((CAST(o_orderkey AS BIGINT) % 7) + 7) % 7 AS pm7,
           GREATEST(o_totalprice, 100000.0) AS gt,
           LEAST(o_totalprice, 100000.0) AS lt
    FROM orders ORDER BY o_orderkey
    """,
)
def scalar_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C26+C27+C28 in one projection over orders — the driver-facing
    representative for the string / datetime / math scalar families."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("up"),
        F.lower("o_orderstatus").alias("lo"),
        F.substring("o_orderpriority", 3, 6).alias("subp"),
        F.length("o_orderpriority").alias("plen"),
        F.concat_ws("#", "o_orderstatus", "o_orderpriority").alias("joined"),
        F.regexp_extract("o_orderpriority", r"([0-9]+)", 1).alias("prio_num"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("padded"),
        F.reverse("o_orderpriority").alias("rev"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_y2k"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.round("o_totalprice", 1).alias("r1"),
        F.floor("o_totalprice").cast("double").alias("flr"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("absd"),
        F.sqrt("o_totalprice").alias("sq"),
        F.round(F.log(F.col("o_totalprice")), 9).alias("lnp"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).cast("bigint").alias("pm7"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("gt"),
        F.least("o_totalprice", F.lit(100000.0)).alias("lt"),
    ).orderBy("o_orderkey")


@query(
    "semi_structured_suite",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CASE WHEN json_extract_string(props, '$.missing') IS NULL
                THEN 1 ELSE 0 END AS missing_is_null,
           json_keys(props)[1] AS first_key,
           len(json_keys(props)) AS n_keys,
           CAST(len(seq) AS BIGINT) AS n_elems,
           CAST(list_sum(seq) AS BIGINT) AS arr_sum,
           CAST(len(list_filter(seq, x -> x % 2 = 0)) AS BIGINT) AS n_even,
           len(list_filter(seq, x -> x > 3)) > 0 AS has_gt3,
           array_to_string(seq, ',') AS arr_csv
    FROM (
      SELECT *, generate_series(1, CAST(
               ((CAST(json_extract_string(props, '$.k') AS BIGINT) % 5) + 5) % 5 + 1
             AS BIGINT)) AS seq
      FROM events)
    ORDER BY event_id
    """,
)
def semi_structured_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C29+C30+C31 in one projection over events — JSON extraction, a
    MapType view of the props document, and array construction + lambda
    ops (size/aggregate/filter/exists) over a derived sequence. All
    scalar outputs (arrays serialize to CSV at the boundary)."""
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    k = F.get_json_object("props", "$.k").cast("bigint")
    seq = F.sequence(F.lit(1).cast("bigint"), F.pmod(k, F.lit(5)) + F.lit(1))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k.alias("k_int"),
        F.when(F.get_json_object("props", "$.missing").isNull(), 1)
        .otherwise(0)
        .alias("missing_is_null"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        F.size(seq).cast("bigint").alias("n_elems"),
        F.aggregate(seq, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("arr_sum"),
        F.size(F.filter(seq, lambda x: x % 2 == 0)).cast("bigint").alias("n_even"),
        F.exists(seq, lambda x: x > 3).alias("has_gt3"),
        F.array_join(F.transform(seq, lambda x: x.cast("string")), ",").alias("arr_csv"),
    ).orderBy("event_id")


@query(
    "array_lambda_funcs",
    """
    SELECT vec_id,
           len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0)) AS n_pos,
           len(list_filter(embedding, x -> CAST(x AS DOUBLE) < -0.9)) > 0 AS has_low,
           len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 1.0)) = 0 AS all_le1,
           CAST(embedding[1] AS DOUBLE) + CAST(embedding[64] AS DOUBLE) AS zsum0
    FROM embeddings ORDER BY vec_id
    """,
)
def array_lambda_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C29 completion: filter / exists / forall / zip_with lambdas (the
    DuckDB twin states each as a list_filter identity)."""
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter(dbl, lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.exists(dbl, lambda x: x < -0.9).alias("has_low"),
        F.forall(dbl, lambda x: x <= 1.0).alias("all_le1"),
        F.element_at(F.zip_with(dbl, F.reverse(dbl), lambda x, y: x + y), 1).alias("zsum0"),
    ).orderBy("vec_id")


@query(
    "array_running_funcs",
    """
    WITH t AS (
      SELECT o_orderkey,
             list_transform(generate_series(1, CAST(o_orderkey % 6 + 2 AS BIGINT)),
                            i -> (o_orderkey * i) % 97) AS arr
      FROM orders WHERE o_orderkey % 113 = 0
    )
    SELECT o_orderkey,
           array_to_string(list_transform(generate_series(1, len(arr)),
                           i -> CAST(list_sum(arr[1:i]) AS BIGINT)), ',')
             AS cumsum_csv,
           array_to_string(list_transform(generate_series(1, len(arr)),
                           i -> CAST(CASE WHEN i = 1 THEN arr[1]
                                          ELSE arr[i] - arr[i-1] END AS BIGINT)), ',')
             AS diff_csv,
           CAST(list_sum(arr) AS BIGINT) AS arr_total
    FROM t ORDER BY o_orderkey
    """,
)
def array_running_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `arrayCumSum` / `arrayDifference` parity: running sum
    and first-difference over an array column, computed with one
    O(n) `aggregate` fold (state = (running list, total)) rather than an
    O(n²) per-index re-sum. Arrays serialize to CSV at the boundary.

    Scale: row-local array expressions in codegen; the modulo filter
    prunes at the scan. (The DuckDB twin uses the quadratic prefix re-sum
    for clarity — fixture arrays are <=7 elements.)"""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 113 == 0)
    k = F.col("o_orderkey")
    arr = F.transform(
        F.sequence(F.lit(1).cast("bigint"), k % 6 + 2), lambda i: (k * i) % 97
    )
    t = o.select("o_orderkey", arr.alias("arr"))
    cumsum = F.aggregate(
        F.col("arr"),
        F.struct(
            F.array().cast("array<bigint>").alias("acc"),
            F.lit(0).cast("bigint").alias("run"),
        ),
        lambda st, x: F.struct(
            F.concat(st.acc, F.array(st.run + x)).alias("acc"),
            (st.run + x).alias("run"),
        ),
        lambda st: st.acc,
    )
    # shift-by-one with an explicit length-n slice so zip_with sees two
    # equal-length arrays (no null-padding to rely on)
    shifted = F.slice(
        F.concat(F.array(F.lit(0).cast("bigint")), F.col("arr")),
        1,
        F.size("arr"),
    )
    diff = F.zip_with(F.col("arr"), shifted, lambda a, prev: a - prev)
    to_csv = lambda c: F.array_join(  # noqa: E731
        F.transform(c, lambda x: x.cast("string")), ","
    )
    return t.select(
        "o_orderkey",
        to_csv(cumsum).alias("cumsum_csv"),
        to_csv(diff).alias("diff_csv"),
        F.aggregate(
            F.col("arr"), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("arr_total"),
    ).orderBy("o_orderkey")


@query(
    "timezone_funcs",
    """
    SELECT event_id,
           (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS ts_ny,
           CAST(hour((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York')
                AS INT) AS hour_ny,
           (ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo' AS ts_tokyo,
           CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo' AS DATE)
             AS date_tokyo
    FROM events
    WHERE event_id % 97 = 0
    ORDER BY event_id
    """,
)
def timezone_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion (ClickHouse `toTimeZone` analog): UTC event
    times shifted to New-York / Tokyo wall time with derived local hour
    and local date — the session-locale reporting shape. Spark's
    `from_utc_timestamp` against DuckDB's double `AT TIME ZONE` hop:
    two INDEPENDENT IANA tzdata consumers (JVM tzdb vs ICU) must agree
    on the offsets, which they do for these zones in the fixture's
    window (January — no DST transition; a DST-crossing fixture would
    additionally pin transition handling).

    Scale: row-local codegen expressions; the modulo filter prunes at
    the scan."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    ny = F.from_utc_timestamp(F.col("ts").cast("timestamp"), "America/New_York")
    tk = F.from_utc_timestamp(F.col("ts").cast("timestamp"), "Asia/Tokyo")
    return e.select(
        "event_id",
        ny.cast("timestamp_ntz").alias("ts_ny"),
        F.hour(ny).cast("int").alias("hour_ny"),
        tk.cast("timestamp_ntz").alias("ts_tokyo"),
        tk.cast("date").alias("date_tokyo"),
    ).orderBy("event_id")


@query(
    "multi_array_zip_flatten",
    """
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok,
           CAST(unnest(list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                      x -> length(x))) AS INT) AS tok_len
    FROM documents
    WHERE doc_id % 50 = 0
    ORDER BY doc_id, tok, tok_len
    """,
)
def multi_array_zip_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The POSITIONAL multi-array flatten ClickHouse writes as
    `ARRAY JOIN a AS x, b AS y` — the form the dialect shim refuses
    with a pointer here: arrays_zip pairs the arrays element-by-element
    and ONE explode emits the zipped rows (two LATERAL VIEWs would
    cross-product instead). DuckDB's parallel unnest zips natively, so
    the oracle derives the same rows through a different mechanism.

    Scale: row-local codegen Generate — zero shuffle for the flatten;
    output rows = total elements."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    # \s+ (not a literal space): the true twin of the oracle's
    # regexp_split_to_array — single-space splits diverge on
    # whitespace runs (r11 review)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    lens = F.transform(toks, lambda x: F.length(x))
    z = F.explode(F.arrays_zip(toks.alias("tok"), lens.alias("tok_len")))
    return (
        d.select("doc_id", z.alias("z"))
        .select(
            "doc_id",
            F.col("z.tok").alias("tok"),
            F.col("z.tok_len").cast("int").alias("tok_len"),
        )
        .orderBy("doc_id", "tok", "tok_len")
    )
