"""Canonical table registry for the synthetic star schema.

The reference registers tables via ``CREATE EXTERNAL TABLE`` over listing
directories (reference: ballista/core/proto/datafusion.proto:171-184,
ListingTableScanNode :99-115). Here the analogue is ``spark.read.parquet``
plus ``createOrReplaceTempView`` — Catalyst then owns projection/filter
pushdown into the scan.

``events.ts`` is stored as parquet TIMESTAMP(NANOS,false), which Spark has
no type for (SURVEY.md §1.2: ns truncates to µs). With
``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as a long
of nanoseconds; ``load_table`` converts it to a proper microsecond
timestamp with ``timestamp_micros(ns div 1000)`` so SQL date/time semantics
match the DuckDB oracle (which reads the same file as TIMESTAMP).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Resolve a synthetic table to a DataFrame. Memoized per session —
    the catalog role: a repeated lookup must not re-read parquet footers
    or rebuild the relation (DataFrames are immutable, so handing the
    same plan out is safe; only the canonical read-only testdata flows
    through here)."""
    cache = getattr(spark, "_bms_table_cache", None)
    if cache is None:
        cache = {}
        spark._bms_table_cache = cache
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    df = _load_table_uncached(spark, sf_dir, name)
    cache[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The driver may hand us a vanilla session without this conf; it is
        # runtime-settable, and without it the NANOS column aborts the scan.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The LTZ-equals-oracle argument below requires the UTC session
        # zone; a driver session on a non-UTC host would otherwise shift
        # every hour()/date_trunc() by the host offset vs DuckDB's naive
        # read. Runtime-settable, like the two parquet confs.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # 2026-08 testdata regen ships ts as plain µs (isAdjustedToUTC=false);
        # without this, Spark 4 infers TIMESTAMP_NTZ, which watermarks reject.
        # LTZ under the UTC session zone is value-identical to the oracle's
        # naive read, and keeps ts predicate pushdown scan-native.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long under nanosAsLong: ns -> µs.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and dict(df.dtypes).get("ts") == "timestamp_ntz":
        # driver-owned session without the NTZ-inference conf: cast (no-op
        # values under UTC), so watermarks and LTZ semantics hold engine-wide.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_all(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every synthetic table as a temp view (idempotent)."""
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
