"""ClickHouse function-family parity beyond the C26–C31 scalar suites:
bit manipulation + group bit aggregates (`bitAnd`/`groupBitAnd`…), IPv4
codec functions (`IPv4NumToString`/`IPv4StringToNum`), URL functions
(`domain`/`path`/`extractURLParameter`), encoding functions
(`hex`/`base64Encode`) and NULL-semantics coverage (nullable arithmetic,
null-safe equality — ClickHouse `Nullable(T)` behaviors).

All JVM-side `pyspark.sql.functions` inside whole-stage codegen — no
Python in the row path; every query has an exact DuckDB twin.

Cross-engine notes baked into the oracles:
- Spark ``hex(bigint)`` and DuckDB ``hex(int)`` both print uppercase,
  no leading zeros — verified bit-identical.
- base64 uses the standard alphabet with padding in both engines.
- Spark ``parse_url`` (java.net.URI semantics) matches plain regexp
  extraction for the well-formed URLs synthesized here; the DuckDB twin
  uses the regexps directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators._util import dec_sum, sql_dec_sum
from ..registry import query
from ..tables import table


@query(
    "bitwise_funcs",
    """
    SELECT l_returnflag,
           bit_and(flags) AS all_and, bit_or(flags) AS any_or,
           bit_xor(flags) AS parity_xor,
           CAST(SUM(flags << 2) AS BIGINT) AS sum_shl,
           CAST(SUM(flags >> 1) AS BIGINT) AS sum_shr,
           CAST(SUM(flags & 21) AS BIGINT) AS sum_and21,
           CAST(SUM(flags | 8) AS BIGINT) AS sum_or8,
           CAST(SUM(xor(flags, 255)) AS BIGINT) AS sum_xor255
    FROM (SELECT l_returnflag,
                 ((l_orderkey % 64) + 64) % 64 AS flags FROM lineitem) t
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse bit-function family (`bitAnd/bitOr/bitXor/bitShiftLeft/
    bitShiftRight`) plus the group bit aggregates (`groupBitAnd/
    groupBitOr/groupBitXor`) — flag-mask analytics (feature bitsets,
    permission masks) entirely inside codegen.

    Scale: map-side partial aggregation reduces each partition to one
    row per group before the 3-key shuffle."""
    l = table(spark, sf_dir, "lineitem")
    flags = F.pmod(F.col("l_orderkey"), F.lit(64)).alias("flags")
    return (
        l.select("l_returnflag", flags)
        .groupBy("l_returnflag")
        .agg(
            F.bit_and("flags").alias("all_and"),
            F.bit_or("flags").alias("any_or"),
            F.bit_xor("flags").alias("parity_xor"),
            F.sum(F.shiftleft("flags", 2)).alias("sum_shl"),
            F.sum(F.shiftright("flags", 1)).alias("sum_shr"),
            F.sum(F.col("flags").bitwiseAND(F.lit(21))).alias("sum_and21"),
            F.sum(F.col("flags").bitwiseOR(F.lit(8))).alias("sum_or8"),
            F.sum(F.col("flags").bitwiseXOR(F.lit(255))).alias("sum_xor255"),
        )
        .orderBy("l_returnflag")
    )


# 32-bit IPv4 derived deterministically from the order key: the exact
# arithmetic (x >> 24 & 255, …) is expressible identically in both
# engines, so the dotted-quad string and the round-tripped number are
# bit-identical.
_IP_SQL = """
    WITH ips AS (
      SELECT o_orderkey, ((o_orderkey * 2654435761) % 4294967296 + 4294967296)
             % 4294967296 AS ip_num
      FROM orders WHERE o_orderkey % 97 = 0
    ), fmt AS (
      SELECT o_orderkey, ip_num,
             CAST(ip_num >> 24 AS VARCHAR) || '.' ||
             CAST((ip_num >> 16) & 255 AS VARCHAR) || '.' ||
             CAST((ip_num >> 8) & 255 AS VARCHAR) || '.' ||
             CAST(ip_num & 255 AS VARCHAR) AS ip_str
      FROM ips
    )
    SELECT o_orderkey, ip_num, ip_str,
           (CAST(string_split(ip_str, '.')[1] AS BIGINT) << 24) +
           (CAST(string_split(ip_str, '.')[2] AS BIGINT) << 16) +
           (CAST(string_split(ip_str, '.')[3] AS BIGINT) << 8) +
            CAST(string_split(ip_str, '.')[4] AS BIGINT) AS ip_roundtrip,
           ip_num >= 2886729728 AND ip_num < 2887778304 AS is_priv_172_16
    FROM fmt ORDER BY o_orderkey
    """


@query("ip_funcs", _IP_SQL)
def ip_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IPv4 codec parity (`IPv4NumToString` /
    `IPv4StringToNum` / CIDR membership a la `isIPAddressInRange`):
    number→dotted-quad→number round-trip plus a private-range predicate,
    all integer/bit arithmetic inside codegen (no UDF, no regex)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    ip = F.pmod(F.col("o_orderkey") * F.lit(2654435761), F.lit(4294967296)).alias(
        "ip_num"
    )
    octet = lambda n: F.shiftright("ip_num", n).bitwiseAND(F.lit(255))  # noqa: E731
    df = o.select("o_orderkey", ip).withColumn(
        "ip_str",
        F.concat_ws(
            ".",
            F.shiftright("ip_num", 24).cast("string"),
            octet(16).cast("string"),
            octet(8).cast("string"),
            F.col("ip_num").bitwiseAND(F.lit(255)).cast("string"),
        ),
    )
    part = lambda i: F.get(F.split("ip_str", r"\."), i - 1).cast("bigint")  # noqa: E731
    return df.select(
        "o_orderkey",
        "ip_num",
        "ip_str",
        (
            F.shiftleft(part(1), 24)
            + F.shiftleft(part(2), 16)
            + F.shiftleft(part(3), 8)
            + part(4)
        ).alias("ip_roundtrip"),
        # 172.16.0.0/12 in numeric form
        ((F.col("ip_num") >= 2886729728) & (F.col("ip_num") < 2887778304)).alias(
            "is_priv_172_16"
        ),
    ).orderBy("o_orderkey")


_URL_SQL = """
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/' || lang || '/doc/' ||
             CAST(doc_id AS VARCHAR) || '?ref=' || CAST(doc_id % 7 AS VARCHAR) ||
             '&page=' || CAST(doc_id % 3 AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(url, '://([^/]+)/', 1) AS host,
           regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref_param,
           regexp_extract(url, '://(?:[^/.]+\\.)*([^/.]+\\.[^/.]+)/', 1)
             AS top_domain
    FROM urls WHERE doc_id % 11 = 0 ORDER BY doc_id
    """


@query("url_funcs", _URL_SQL)
def url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse URL-function family (`protocol`/`domain`/`path`/
    `extractURLParameter`/`topLevelDomain`-ish) via Spark's native
    `parse_url` (HOST/PATH/QUERY/PROTOCOL parts) plus one regexp for the
    registrable-domain tail. URLs are synthesized deterministically from
    `documents`, so the twin is exact.

    Scale: row-local string work inside codegen; the filter prunes 10/11
    of rows at the scan."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&page="),
        (F.col("doc_id") % 3).cast("string"),
    ).alias("url")
    part = lambda p: F.parse_url("url", F.lit(p))  # noqa: E731
    return (
        d.select("doc_id", url)
        .select(
            "doc_id",
            "url",
            part("PROTOCOL").alias("protocol"),
            part("HOST").alias("host"),
            part("PATH").alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
            F.regexp_extract(
                "url", r"://(?:[^/.]+\.)*([^/.]+\.[^/.]+)/", 1
            ).alias("top_domain"),
        )
        .orderBy("doc_id")
    )


@query(
    "encode_funcs",
    """
    SELECT c_custkey,
           hex(c_custkey * 255) AS key_hex,
           to_base64(encode(c_mktsegment)) AS seg_b64,
           decode(from_base64(to_base64(encode(c_name)))) AS name_rt,
           hex(c_custkey) = hex(c_custkey) AS hex_stable
    FROM customer WHERE c_custkey % 13 = 0 ORDER BY c_custkey
    """,
)
def encode_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse encoding-function parity (`hex`, `base64Encode`,
    `base64Decode` round-trip): binary-safe codecs inside codegen.
    Both engines print uppercase hex without leading zeros and standard
    padded base64 — verified bit-identical."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 13 == 0)
    return c.select(
        "c_custkey",
        F.hex(F.col("c_custkey") * 255).alias("key_hex"),
        F.base64(F.col("c_mktsegment").cast("binary")).alias("seg_b64"),
        F.unbase64(F.base64(F.col("c_name").cast("binary")))
        .cast("string")
        .alias("name_rt"),
        (F.hex("c_custkey") == F.hex("c_custkey")).alias("hex_stable"),
    ).orderBy("c_custkey")


@query(
    "null_semantics",
    """
    WITH n AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_totalprice END AS maybe_price,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END AS maybe_prio
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(maybe_price) AS n_price,
           COUNT(DISTINCT maybe_prio) AS n_prio,
           CAST(SUM(CASE WHEN maybe_price IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_price,
           CAST(SUM(CASE WHEN maybe_prio IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe,
           CAST(SUM(CASE WHEN COALESCE(maybe_price, 0.0) = 0.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_coalesced,
           CAST(SUM(CASE WHEN NULLIF(maybe_prio, '1-URGENT') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nullif,
           {sum_skipnull} AS sum_skipnull
    FROM n
    """.format(sum_skipnull=sql_dec_sum("COALESCE(maybe_price, 0.0)")),
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `Nullable(T)` semantics coverage: null-skipping
    aggregates (COUNT(col) vs COUNT(*)), null-safe equality
    (`equal_null` ≡ IS NOT DISTINCT FROM), COALESCE/NULLIF/IFNULL
    behaviors — the places where engines classically diverge.

    Scale: single global aggregate with map-side partials; the
    modulo filter is pushed to the scan."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0)
    n = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("maybe_price"),
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("maybe_prio"),
    )
    null_str = F.lit(None).cast("string")
    return n.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("maybe_price").alias("n_price"),
        F.countDistinct("maybe_prio").alias("n_prio"),
        F.sum(F.col("maybe_price").isNull().cast("bigint")).alias("n_null_price"),
        F.sum(F.equal_null(F.col("maybe_prio"), null_str).cast("bigint")).alias(
            "n_null_safe"
        ),
        F.sum((F.coalesce("maybe_price", F.lit(0.0)) == 0.0).cast("bigint")).alias(
            "n_coalesced"
        ),
        F.sum(
            F.nullif(F.col("maybe_prio"), F.lit("1-URGENT")).isNull().cast("bigint")
        ).alias("n_nullif"),
        dec_sum(F.coalesce("maybe_price", F.lit(0.0))).alias("sum_skipnull"),
    )


_GEO_SQL = """
    WITH pts AS (
      SELECT c_custkey,
             (CAST(c_custkey * 131 % 17000 AS DOUBLE) / 100.0) - 85.0 AS lat,
             (CAST(c_custkey * 733 % 35000 AS DOUBLE) / 100.0) - 175.0 AS lon
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c_custkey, lat, lon,
           ROUND(2.0 * 6371.0088 * asin(sqrt(
             pow(sin(radians(lat - 48.8566) / 2.0), 2) +
             cos(radians(48.8566)) * cos(radians(lat)) *
             pow(sin(radians(lon - 2.3522) / 2.0), 2))), 3) AS km_to_paris,
           ROUND(degrees(atan2(lat - 48.8566, lon - 2.3522)), 3) AS bearing_flat
    FROM pts ORDER BY c_custkey
    """


@query("geo_distance", _GEO_SQL)
def geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse geo-function parity (`greatCircleDistance` analog):
    haversine distance to a fixed point plus a flat bearing, from
    deterministic synthetic coordinates. ROUND(,3) (meter precision)
    absorbs the ≤1-ulp libm-vs-JVM trig divergence — the formula and
    the double inputs are identical on both sides.

    Scale: pure row-local codegen arithmetic; the modulo filter prunes
    at the scan."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 == 0)
    lat = ((F.col("c_custkey") * 131 % 17000).cast("double") / 100.0 - 85.0).alias("lat")
    lon = ((F.col("c_custkey") * 733 % 35000).cast("double") / 100.0 - 175.0).alias(
        "lon"
    )
    pts = c.select("c_custkey", lat, lon)
    hav = (
        F.pow(F.sin(F.radians(F.col("lat") - 48.8566) / 2.0), 2)
        + F.cos(F.radians(F.lit(48.8566)))
        * F.cos(F.radians("lat"))
        * F.pow(F.sin(F.radians(F.col("lon") - 2.3522) / 2.0), 2)
    )
    return pts.select(
        "c_custkey",
        "lat",
        "lon",
        F.round(2.0 * 6371.0088 * F.asin(F.sqrt(hav)), 3).alias("km_to_paris"),
        F.round(
            F.degrees(F.atan2(F.col("lat") - 48.8566, F.col("lon") - 2.3522)), 3
        ).alias("bearing_flat"),
    ).orderBy("c_custkey")


@query(
    "conditional_aggregates",
    f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           {sql_dec_sum('l_extendedprice')} AS sum_all,
           CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(30,4)))
                  FILTER (WHERE l_quantity >= 25), 0) AS DOUBLE) AS sum_bulk,
           MIN(l_extendedprice) FILTER (WHERE l_linestatus = 'F') AS min_f,
           MAX(l_extendedprice) FILTER (WHERE l_linestatus = 'O') AS max_o,
           COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax > 0.04)
             AS n_taxed_supps
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `-If` aggregate-combinator parity (`countIf`/`sumIf`/
    `minIf`/`maxIf`/`uniqExactIf`): conditional aggregation without
    pre-filtering the scan — one pass computes every branch, where a
    filter-per-aggregate would need N scans.

    Scale: all conditions evaluate map-side inside one partial
    aggregate; the shuffle still carries one row per (partition, group)."""
    l = table(spark, sf_dir, "lineitem")
    when = lambda c, v: F.when(c, v)  # noqa: E731
    disc = F.col("l_discount") > 0.05
    bulk = F.col("l_quantity") >= 25
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.count(when(disc, 1)).alias("n_discounted"),
            dec_sum("l_extendedprice").alias("sum_all"),
            F.coalesce(
                F.sum(when(bulk, F.col("l_extendedprice")).cast("decimal(30,4)")),
                F.lit(0).cast("decimal(30,4)"),
            )
            .cast("double")
            .alias("sum_bulk"),
            F.min(when(F.col("l_linestatus") == "F", F.col("l_extendedprice"))).alias(
                "min_f"
            ),
            F.max(when(F.col("l_linestatus") == "O", F.col("l_extendedprice"))).alias(
                "max_o"
            ),
            F.countDistinct(
                when(F.col("l_tax") > 0.04, F.col("l_suppkey"))
            ).alias("n_taxed_supps"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "string_search_funcs",
    """
    SELECT doc_id,
           position('merge' IN text) AS pos_merge,
           text LIKE '%join%' AS has_join,
           starts_with(text, 'the') AS starts_the,
           suffix(text, 'dup') AS ends_dup,
           regexp_matches(text, 'batch (batch )+batch') AS has_batch_run,
           len(regexp_extract_all(text, 'scan', 0)) AS n_scan,
           len(string_split(text, 'data')) - 1 AS n_data
    FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id
    """,
)
def string_search_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse string-search family parity (`position`, `like`,
    `startsWith`/`endsWith`, `match`, `countSubstrings`,
    `countMatches`): substring location and counting entirely in
    codegen — the text-mining primitives under the quality filters.

    Scale: row-local; the modulo filter prunes 12/13 at the scan."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    return d.select(
        "doc_id",
        F.instr("text", "merge").cast("bigint").alias("pos_merge"),
        F.col("text").like("%join%").alias("has_join"),
        F.startswith("text", F.lit("the")).alias("starts_the"),
        F.endswith("text", F.lit("dup")).alias("ends_dup"),
        F.regexp_like("text", F.lit("batch (batch )+batch")).alias("has_batch_run"),
        F.size(F.regexp_extract_all("text", F.lit("scan"), F.lit(0)))
        .cast("bigint")
        .alias("n_scan"),
        (F.size(F.split("text", "data")) - 1).cast("bigint").alias("n_data"),
    ).orderBy("doc_id")


@query(
    "dict_get_lookup",
    f"""
    SELECT r_name AS region_name,
           COUNT(*) AS n_custs,
           COUNT(DISTINCT n_name) AS n_nations,
           {sql_dec_sum('c_acctbal')} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY region_name
    """,
)
def dict_get_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse external-dictionary parity (`dictGet('nation', 'name',
    key)`): the nation/region dimensions are collected once (25 + 5 rows
    — dictionary metadata, same driver-side exception as IVF centroids)
    and pinned as literal maps, so enrichment is a pure row-local
    expression — no join operator, not even a broadcast exchange.

    Scale: removes two joins from the fact path entirely; the dictionary
    rebuild is a per-batch metadata read exactly like ClickHouse's
    dictionary refresh. The oracle states the equivalent joins."""
    nat = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in table(spark, sf_dir, "nation").collect()
    }
    reg = {r["r_regionkey"]: r["r_name"] for r in table(spark, sf_dir, "region").collect()}
    nation_name = F.create_map(
        *[F.lit(x) for k, (name, _) in sorted(nat.items()) for x in (k, name)]
    )
    region_name = F.create_map(
        *[F.lit(x) for k, (_, rk) in sorted(nat.items()) for x in (k, reg[rk])]
    )
    c = table(spark, sf_dir, "customer")
    key = F.col("c_nationkey")
    return (
        c.select(
            region_name[key].alias("region_name"),
            nation_name[key].alias("nation_name"),
            "c_acctbal",
        )
        .groupBy("region_name")
        .agg(
            F.count("*").alias("n_custs"),
            F.countDistinct("nation_name").alias("n_nations"),
            dec_sum("c_acctbal").alias("sum_acctbal"),
        )
        .orderBy("region_name")
    )


@query(
    "format_funcs",
    """
    WITH t AS (
      SELECT o_orderkey,
             (CAST(ROUND(o_totalprice * 100) AS BIGINT) << (o_orderkey % 20)) AS b
      FROM orders WHERE o_orderkey % 101 = 0
    ),
    u AS (
      SELECT o_orderkey, b,
             CASE WHEN b < 1024 THEN 0 WHEN b < 1048576 THEN 1
                  WHEN b < 1073741824 THEN 2
                  WHEN b < 1099511627776 THEN 3 ELSE 4 END AS i
      FROM t
    )
    SELECT o_orderkey, b AS n_bytes,
           CAST(b // (CAST(1 AS BIGINT) << (10 * i)) AS VARCHAR) || '.'
             || lpad(CAST((b % (CAST(1 AS BIGINT) << (10 * i))) * 100 // (CAST(1 AS BIGINT) << (10 * i))
                          AS VARCHAR), 2, '0')
             || ' ' || ['B', 'KiB', 'MiB', 'GiB', 'TiB'][i + 1]
             AS readable_size,
           repeat('#', CAST(o_orderkey % 11 AS INTEGER)) AS bar10
    FROM u ORDER BY o_orderkey
    """,
)
def format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse presentation-function parity (`formatReadableSize`,
    `bar`): human-readable byte sizes and inline histogram bars.

    The two-decimal mantissa is computed with INTEGER arithmetic
    (quotient + scaled remainder against a power-of-two divisor), so
    both engines format bit-identically — float division + round would
    diverge at half-ulp boundaries.

    Scale: row-local codegen string ops; the modulo filter prunes at
    the scan."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0)
    # shiftleft with a COLUMN shift amount is SQL-only (the Python
    # wrapper insists on a literal int)
    b = F.expr(
        "shiftleft(CAST(ROUND(o_totalprice * 100) AS BIGINT), CAST(o_orderkey % 20 AS INT))"
    )
    t = o.select("o_orderkey", b.alias("b"))
    i = (
        F.when(F.col("b") < 1024, 0)
        .when(F.col("b") < 1048576, 1)
        .when(F.col("b") < 1073741824, 2)
        .when(F.col("b") < 1099511627776, 3)
        .otherwise(4)
    )
    u = t.select("o_orderkey", "b", i.alias("i"))
    div = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(i * 10 AS INT))")
    whole = F.floor(F.col("b") / div).cast("bigint")
    frac2 = F.floor((F.col("b") % div) * 100 / div).cast("bigint")
    units = F.array(*[F.lit(s) for s in ["B", "KiB", "MiB", "GiB", "TiB"]])
    return u.select(
        "o_orderkey",
        F.col("b").alias("n_bytes"),
        F.concat(
            whole.cast("string"),
            F.lit("."),
            F.lpad(frac2.cast("string"), 2, "0"),
            F.lit(" "),
            F.element_at(units, F.col("i") + 1),
        ).alias("readable_size"),
        F.expr("repeat('#', CAST(o_orderkey % 11 AS INT))").alias("bar10"),
    ).orderBy("o_orderkey")


@query(
    "retention_conditions",
    """
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'signup'
                       AND CAST(ts AS DATE) <= DATE '2024-01-05'
                      THEN 1 ELSE 0 END) AS r1,
             MAX(CASE WHEN event_type = 'purchase'
                       AND CAST(ts AS DATE) BETWEEN DATE '2024-01-06'
                                               AND DATE '2024-01-15'
                      THEN 1 ELSE 0 END) AS c2,
             MAX(CASE WHEN event_type = 'purchase'
                       AND CAST(ts AS DATE) >= DATE '2024-01-16'
                      THEN 1 ELSE 0 END) AS c3
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(r1) AS BIGINT) AS n_cohort,
           CAST(SUM(r1 * c2) AS BIGINT) AS ret_mid,
           CAST(SUM(r1 * c3) AS BIGINT) AS ret_late,
           CAST(SUM(r1 * c2 * c3) AS BIGINT) AS ret_both
    FROM per_user
    """,
)
def retention_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `retention(cond1, ..., condN)` parity: per user, the
    aggregate evaluates an ordered condition list where the FIRST
    condition gates all later ones (r[i] = cond1 AND condi) — here
    "signed up in the first 5 days" gating "purchased mid-month" /
    "purchased late-month" — then the rollup sums each slot over users,
    giving the classic retention funnel numerators over the
    denominator sum(r1). Differs from `cohort_retention` (the
    signup-week x activity-week matrix): this is the CH aggregate's
    exact gate-array semantics, including the ret_both conjunction slot
    a cohort matrix cannot express.

    Scale: one shuffle on user_id with map-side partial MAX flags
    (per-user state = N condition bits), then a 1-row global sum of
    partials — the same two-level shape at any corpus size; never a
    per-user array materialization."""
    e = table(spark, sf_dir, "events")
    day = F.to_date("ts")
    flag = lambda cond: F.max(F.when(cond, 1).otherwise(0))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        flag(
            (F.col("event_type") == "signup") & (day <= F.lit("2024-01-05"))
        ).alias("r1"),
        flag(
            (F.col("event_type") == "purchase")
            & day.between(F.lit("2024-01-06"), F.lit("2024-01-15"))
        ).alias("c2"),
        flag(
            (F.col("event_type") == "purchase") & (day >= F.lit("2024-01-16"))
        ).alias("c3"),
    )
    s = lambda c: F.sum(c).cast("bigint")  # noqa: E731
    return per_user.agg(
        s(F.col("r1")).alias("n_cohort"),
        s(F.col("r1") * F.col("c2")).alias("ret_mid"),
        s(F.col("r1") * F.col("c3")).alias("ret_late"),
        s(F.col("r1") * F.col("c2") * F.col("c3")).alias("ret_both"),
    )
