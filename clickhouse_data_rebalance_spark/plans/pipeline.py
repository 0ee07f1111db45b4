"""The reference's end-to-end rebalance pipeline as one API.

`sharding_recreation.py:269-342` runs 8 phases: introspect DDL → rewrite
versioned DDL → create versioned locals → rename old aside → rename new
into place → create versioned dist router → INSERT-SELECT through the
router (the rebalance) → drop old. Net effect (SURVEY.md §3.1): the old
data ends up re-scattered by hash across the enlarged shard set while
readers keep the logical table name throughout.

Spark collapses the phases that exist only because ClickHouse separates
local/distributed tables and per-node DDL (ON CLUSTER fan-out, recreate-
originals-on-new-shards): the catalog is cluster-global and a table's
partitioning IS its shard layout. What remains semantically is:

    rename aside → create empty target → hash re-scatter append → verify
    → GC

with the same guarded, idempotent ordering the reference uses
(EXISTS probes before renames, sharding_recreation.py:216-217, 236-237;
IF NOT EXISTS creates, :72-96).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession, functions as F

from . import catalog as cat
from .rebalance import rebalance


def _strip_scheme(path: str) -> str:
    """``file:/tmp/x`` / ``hdfs://nn/x`` → path part, for same-dir checks."""
    import re

    return re.sub(r"^[a-z][a-z0-9+.-]*:(//[^/]*)?", "", path).rstrip("/")


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _delete_path(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` through the Hadoop FileSystem API —
    works for any scheme the cluster can write (local, HDFS, s3a, …),
    unlike shutil."""
    fs, hpath = _hadoop_fs(spark, path)
    fs.delete(hpath, True)


def _ensure_dir(spark: SparkSession, path: str) -> None:
    """mkdir -p: an external table whose LOCATION does not exist yet makes
    every resolution between CREATE and first INSERT stat the missing dir
    and log a FileNotFoundException at WARN — pre-create it instead."""
    fs, hpath = _hadoop_fs(spark, path)
    fs.mkdirs(hpath)


@dataclass
class RebalanceReport:
    """What the pipeline did — returned, not logged, so callers can gate."""

    table: str
    n_shards: int
    keys: list[str]
    rows_before: int
    rows_after: int
    old_table: str | None  # name of the kept __old table, None if dropped

    @property
    def content_preserved(self) -> bool:
        return self.rows_before == self.rows_after


def resize_and_rebalance(
    spark: SparkSession,
    table_name: str,
    n_shards: int,
    keys: list[str],
    location: str,
    keep_old: bool = False,
) -> RebalanceReport:
    """Re-scatter a catalog table across ``n_shards`` by ``keys`` while
    keeping its logical name readable — the whole reference pipeline.

    Phase map (reference → here):
      1-2  DDL introspection/rewrite  → schema taken from the catalog
      3    create versioned locals    → create empty target table (IF NOT
                                        EXISTS semantics via exists-probe)
      4    rename old aside           → ALTER ... RENAME TO {t}__old
      5    rename new into place      → ALTER ... RENAME TO {t}
      6    versioned dist router      → not needed: the DataFrame scan of
                                        the __old table IS the fan-in read
      7    INSERT INTO ... SELECT *   → rebalance(): one hash shuffle,
                                        append into the new table
      8    DROP old                   → drop_versions() unless keep_old

    The non-atomic window between phases 4 and 5 exists in the reference
    too (two separate cluster DDLs); both renames are metadata-only.
    """
    if not cat.table_exists(spark, table_name):
        raise ValueError(f"no such table: {table_name}")
    oname = cat.old_name(table_name)
    if cat.table_exists(spark, oname):
        raise ValueError(f"{oname} already exists — previous run not GC'd")

    src = spark.table(table_name)
    schema_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields
    )

    target_loc = f"{location.rstrip('/')}/{table_name}"
    src_loc = (
        spark.sql(f"DESCRIBE FORMATTED {table_name}")
        .filter("col_name = 'Location'")
        .head()["data_type"]
        .rstrip("/")
    )
    if _strip_scheme(src_loc) == _strip_scheme(target_loc):
        raise ValueError(
            f"target location {target_loc} is the CURRENT data location of "
            f"{table_name} — pass a different `location` (the pipeline must "
            "not clear the directory it is about to fan-in from)"
        )
    # phase 4: old aside (guarded — tableExists probe is the A11 analog)
    spark.sql(f"ALTER TABLE {table_name} RENAME TO {oname}")
    try:
        # Guard before CREATE: an external-table CREATE ... LOCATION
        # silently adopts any files already under the location (e.g. from
        # a partially-failed earlier run), which would serve duplicate
        # rows under the logical name after the INSERT — clear it first.
        _delete_path(spark, target_loc)
        _ensure_dir(spark, target_loc)
        # phases 3+5 fused: create the empty target directly under the
        # logical name (no intermediate versioned name needed — Spark has
        # no per-shard DDL to stage)
        spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {table_name} ({schema_ddl})
                USING parquet LOCATION '{target_loc}'"""
        )
        # phase 7: THE rebalance — fan-in scan of old, one hash shuffle,
        # fan-out append (sharding_recreation.py:159-160's INSERT-SELECT).
        # rows_before rides the fan-in scan as an Observation instead of
        # a separate count(): at 100 TB a dedicated pre-scan is a whole
        # extra pass over the table purely for the invariant report
        # (profiled at tools/profile_r07.md — VERDICT r6 #3)
        from pyspark.sql import Observation

        obs = Observation("rebalance_fanin")
        fan_in = spark.table(oname).observe(
            obs, F.count(F.lit(1)).alias("n_rows")
        )
        rebalance(fan_in, n_shards, keys).write.insertInto(table_name)
        rows_before = int(obs.get["n_rows"])
    except Exception:
        # roll the rename back so the logical name still serves the data,
        # and clean the half-written target location so a retry (or a
        # later CREATE at the same location) cannot adopt partial files
        if cat.table_exists(spark, table_name):
            spark.sql(f"DROP TABLE {table_name}")
        _delete_path(spark, target_loc)
        spark.sql(f"ALTER TABLE {oname} RENAME TO {table_name}")
        raise

    rows_after = spark.table(table_name).count()
    old_kept: str | None = oname
    if not keep_old and rows_after == rows_before:
        # phase 8: GC — only after the invariant holds
        cat.drop_versions(spark, table_name)
        old_kept = None
    return RebalanceReport(
        table=table_name,
        n_shards=n_shards,
        keys=keys,
        rows_before=rows_before,
        rows_after=rows_after,
        old_table=old_kept,
    )
