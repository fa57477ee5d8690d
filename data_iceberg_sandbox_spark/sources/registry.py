"""Testdata source registry (SURVEY §2.1 S1).

The driver materializes a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` as one parquet file per table
(TESTDATA.md). This module is the engine's scan layer for them:
``spark.read.parquet`` — columnar, with Catalyst predicate pushdown and
column pruning intact (the reference delegates the same to its engines'
Iceberg readers, e.g. /root/reference/infra/README.md:106).

Scale note: a single ``read.parquet(path)`` over a directory of many
files is the 100 TB shape too; no per-file driver loops here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
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
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver's parquet stamps timestamps as INT64 TIMESTAMP(NANOS), which
# Spark's vectorized reader rejects. We read nanos as longs (session conf,
# works on any caller-provided SparkSession too) and convert to micros
# timestamps in the scan layer — floor(n/1000), matching DuckDB's own
# nanos→micros truncation, so oracle comparisons agree.
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


# Memoized per (session, dir, table): re-resolving the same static
# parquet table costs a footer/schema read plus the conversion-projection
# build in py4j round trips (~50-150 ms) — measured at roughly HALF of
# total suite latency when every query re-loads its inputs. DataFrames
# are immutable, so handing back the same object is safe; the weak-keyed
# outer map scopes entries to a live SparkSession object (dies with it,
# no id-reuse aliasing).
import weakref

_LT_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Pin UTC + nanosAsLong on EVERY call (cache hits included): session
    # conf is read at action time, so a caller flipping the timezone
    # after the first load would otherwise shift every event-time window
    # — the pin is the invariant, the memo only skips plan re-building.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    per_session = _LT_CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    hit = per_session.get(key)
    if hit is not None:
        return hit
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _TS_COLS.get(name, ()):
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):
            # legacy driver stamp: INT64 TIMESTAMP(NANOS) read as long.
            # integer `div` — float division would lose sub-µs exactness
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # current driver stamp: Timestamp(isAdjustedToUTC=false, micros)
            # arrives as TIMESTAMP_NTZ. The engine's event-time contract is
            # plain TIMESTAMP (watermarks and epoch casts require it); with
            # the session tz pinned UTC above, this cast relabels the same
            # wall-clock as the same instant — DuckDB reads the identical
            # naive value, so every oracle hash is unchanged.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    per_session[key] = df
    return df


def pin_table(
    spark: SparkSession, sf_dir: str, name: str, df: DataFrame
) -> DataFrame:
    """Swap the scan-layer memo entry for ``name`` with a caller-prepared
    frame (typically ``load_table(...).repartition(k).cache()``): every
    later ``load_table`` call returns that exact object, so downstream
    plans reference the cached, re-balanced relation directly.

    This is the resident-engine buffer-pool hook the bench uses. It
    matters because the testdata parquet is ONE row group per table —
    byte-range splits collapse onto a single task, so a cache built
    straight off the scan is 100%-skewed (all of lineitem in one
    partition; measured 2.4× slower per aggregation than a balanced
    pin). At cluster scale the analog is caching hot tables with sane
    partitioning instead of inheriting a pathological file layout."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    per_session = _LT_CACHE.setdefault(spark, {})
    per_session[(os.path.abspath(sf_dir), name)] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` (the
    interactive-SQL surface, reference §3.3) sees the same names DuckDB
    pre-registers for the oracle."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
