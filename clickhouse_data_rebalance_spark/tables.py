"""Fixture loader: the 10 driver-generated parquet tables -> temp views.

Single entry point for all fixture access (SURVEY.md §7.0). Views are
registered once per (session, sf_dir) and cached; switching sf_dir
re-registers. Reads are plain ``spark.read.parquet`` so Catalyst keeps
predicate pushdown / column pruning / vectorized scan on every query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

from .session import tune_session

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables worth broadcasting in joins at any scale: these
# stay small even at 100 TB total (region=5, nation=25 rows always).
BROADCAST_DIMS = {"region", "nation"}

_loaded: dict[tuple[int, str], dict[str, DataFrame]] = {}
# fixture fingerprint (mtime+size per file) captured when a cache entry
# was built: a fixture regenerated UNDER THE SAME PATH mid-session (it
# has happened between rounds) must invalidate the cached frames, whose
# schemas were resolved from the old footers
_fingerprints: dict[tuple[int, str], tuple] = {}
# which sf_dir's views are CURRENTLY registered per session — temp views
# are keyed by bare name, so switching sf_dir must re-point them or a
# cached sf_dir would silently serve another sf_dir's data
_active: dict[int, str] = {}


def _fingerprint(sf_dir: str) -> tuple:
    fp = []
    for name in TABLE_NAMES:
        try:
            st = os.stat(os.path.join(sf_dir, f"{name}.parquet"))
            fp.append((name, st.st_mtime_ns, st.st_size))
        except OSError:
            fp.append((name, None, None))
    return tuple(fp)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to a µs timestamp regardless of fixture vintage.

    The driver has regenerated the fixtures with different ts encodings
    across rounds: TIMESTAMP(NANOS) (arrives as a long via the
    ``nanosAsLong`` conf — truncate ns -> µs exactly like DuckDB does on
    read) vs plain ``timestamp[us]`` (arrives as a timestamp already —
    pass through untouched). Guard on the loaded dtype so either vintage
    works; used by both the batch loader and the streaming replay source.
    """
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _session_id(spark: SparkSession) -> int:
    return id(spark._jsparkSession if hasattr(spark, "_jsparkSession") else spark)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all fixture tables as temp views; return name -> DataFrame.

    Cached per (session, sf_dir): re-reading 10 parquet footers on every
    query build costs ~1 s of driver time that a cache makes one-time.
    On a cache hit for a DIFFERENT sf_dir than the one whose views are
    live, the views are re-registered — otherwise name-keyed views would
    keep serving the previously-active sf_dir's data.
    """
    sid = _session_id(spark)
    key = (sid, sf_dir)
    if key in _loaded:
        if _fingerprints.get(key) != _fingerprint(sf_dir):
            # fixture files changed under the cached path — drop the entry
            # and fall through to a fresh read (stat of 10 files, ~µs)
            del _loaded[key]
        else:
            if _active.get(sid) != sf_dir:
                for name, df in _loaded[key].items():
                    df.createOrReplaceTempView(name)
                _active[sid] = sf_dir
            return _loaded[key]
    tune_session(spark)
    fp = _fingerprint(sf_dir)
    dfs = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        if name == "events":
            df = normalize_events_ts(df)
        dfs[name] = df
        df.createOrReplaceTempView(name)
    _loaded[key] = dfs
    _fingerprints[key] = fp
    _active[sid] = sf_dir
    return dfs


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # return the per-sf_dir frame directly (NOT spark.table(name): the
    # bare-name view may belong to a different sf_dir until re-pointed)
    return load_tables(spark, sf_dir)[name]
