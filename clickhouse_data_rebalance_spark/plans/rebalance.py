"""Bulk re-shard data movement — the reference's one real query
(`INSERT INTO dist SELECT * FROM dist_v`, sharding_recreation.py:145-161)
as a first-class Spark API (SURVEY.md C35–C39).

ClickHouse semantics being reproduced: a Distributed-table INSERT reads
the union of all old shard-local data (fan-in) and scatters every row to
``hash(sharding_key) % n_shards`` over the *new* shard set (fan-out).
In Spark that is exactly one shuffle:

    df.repartition(n_shards, xxhash64(*keys)).write.parquet(dst)

Scale design:
- one wide shuffle, no driver-side data path (no collect anywhere);
- `xxhash64` is computed JVM-side inside codegen;
- AQE splits skewed shuffle partitions automatically; for pathological
  keys use ``salt`` which spreads each hot key over ``salt`` sub-shards;
- output file count == n_shards, so downstream scans get even splits;
- `repartitionByRange` variant gives sorted layout for range pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def shard_id(n_shards: int, *keys: str, salt: int = 0) -> F.Column:
    """Deterministic shard assignment: pmod(xxhash64(keys), n) — the Spark
    analog of ClickHouse's `hash(sharding_key) % cluster_size`."""
    h = F.xxhash64(*[F.col(k) for k in keys])
    if salt > 1:
        # spread each key over `salt` sub-shards — breaks hot-key skew while
        # keeping assignment deterministic given the row's full content
        h = F.xxhash64(h, F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    return F.pmod(h, F.lit(n_shards)).cast("int")


def rebalance(
    df: DataFrame,
    n_shards: int,
    keys: list[str],
    dst_path: str | None = None,
    salt: int = 0,
) -> DataFrame:
    """Re-scatter ``df`` across ``n_shards`` by hash of ``keys`` (C35).

    Returns the repartitioned frame; writes parquet when ``dst_path``
    given (one file per shard → even downstream splits).
    """
    # partition directly on the key columns: Spark's HashPartitioning IS
    # hash(keys) % n_shards. (Re-hashing a precomputed shard id would
    # compound two hashes — shard values collide and some of the n output
    # partitions come out empty.)
    cols = [F.col(k) for k in keys]
    if salt > 1:
        cols.append(F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    out = df.repartition(n_shards, *cols)
    if dst_path:
        out.write.mode("overwrite").parquet(dst_path)
    return out


def rebalance_by_range(
    df: DataFrame, n_shards: int, keys: list[str], dst_path: str | None = None
) -> DataFrame:
    """C38: range re-shard — sorted layout for range-pruned scans."""
    out = df.repartitionByRange(n_shards, *[F.col(k) for k in keys])
    if dst_path:
        out.write.mode("overwrite").parquet(dst_path)
    return out


def skew_report(df: DataFrame, n_shards: int, keys: list[str]) -> DataFrame:
    """C37: rows per prospective shard + balance stats, computed purely
    distributed (aggregate of an aggregate, no collect)."""
    per_shard = df.groupBy(shard_id(n_shards, *keys).alias("shard")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return per_shard.agg(
        F.count(F.lit(1)).alias("n_shards_used"),
        F.min("n_rows").alias("min_rows"),
        F.max("n_rows").alias("max_rows"),
        (F.max("n_rows") / F.avg("n_rows")).alias("skew_ratio"),
        F.sum("n_rows").alias("total_rows"),
    )


def insert_select(
    spark: SparkSession, dst_table: str, select_sql: str, overwrite: bool = False
) -> None:
    """C39: INSERT INTO … SELECT between registered tables — the literal
    shape of the reference's rebalance query (sharding_recreation.py:160)."""
    mode = "OVERWRITE TABLE" if overwrite else "INTO"
    spark.sql(f"INSERT {mode} {dst_table} {select_sql}")
