"""Incremental materialized-rollup maintenance (batch side).

The streaming incremental sink (streaming/__init__.run_incremental_sink)
maintains an hourly rollup as micro-batches arrive; this module is the
BATCH counterpart for bulk backfills and late-arriving partitions:
given the materialized rollup and a DELTA of raw rows, recompute ONLY
the time partitions the delta touches and swap them in via dynamic
partition overwrite — cost O(touched partitions' raw rows), never a
full re-aggregation. This is partition-grain incremental view
maintenance, the practical MV-refresh shape for an append-mostly 100 TB
fact table (Delta/BigQuery MVs do the same bookkeeping with a log; the
hive layout makes the touched-partition set explicit).

Correctness rule: the refresh recomputes touched hours FROM THE FULL
RAW TABLE (not from rollup+delta arithmetic), so it is idempotent,
handles reprocessed/duplicate deltas, and supports non-distributive
aggregates (countDistinct) for free. The raw-side scan prunes to the
touched hours (partition filters when raw is hour-partitioned;
predicate pushdown otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The maintained aggregate: per (hour, event_type) count, value sum,
    distinct users (non-distributive on purpose — the refresh contract
    must survive it)."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_v"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def materialize_rollup(events: DataFrame, path: str) -> None:
    """Initial build: full aggregation, hour-partitioned layout."""
    (
        hourly_rollup(events)
        .repartition("hour")
        .write.mode("overwrite")
        .partitionBy("hour")
        .parquet(path)
    )


def refresh_rollup(
    spark: SparkSession,
    path: str,
    raw: DataFrame,
    delta: DataFrame,
) -> list[str]:
    """Refresh the materialized rollup for exactly the hours `delta`
    touches, recomputing those hours from `raw` (which must already
    contain the delta rows). Returns the refreshed hour keys. Untouched
    partitions' files are never rewritten (asserted byte-stable in
    tests)."""
    touched = [
        r["hour"]
        for r in delta.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour")
        )
        .distinct()
        .collect()
    ]
    if not touched:
        return []
    # null-ts delta rows hash to the null hour partition
    # (__HIVE_DEFAULT_PARTITION__): isin([None]) matches nothing under
    # SQL null semantics, so recompute it with an explicit isNull branch
    # — and keep None out of sorted() (str/None comparison TypeError)
    non_null = [t for t in touched if t is not None]
    has_null = len(non_null) < len(touched)
    hour_col = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
    cond = hour_col.isin(non_null) if non_null else F.lit(False)
    if has_null:
        cond = cond | hour_col.isNull()
    fresh = hourly_rollup(raw.filter(cond))
    (
        fresh.repartition("hour")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("hour")
        .parquet(path)
    )
    return sorted(non_null) + ([None] if has_null else [])


def reaggregate_rollup(hourly: DataFrame, granularity: str = "day") -> DataFrame:
    """Coarser rollup FROM the hourly rollup — no raw scan: counts and
    sums re-aggregate distributively (sum of partials == direct), so a
    daily/weekly dashboard reads the KB-scale hourly table instead of
    the 100 TB facts. Distinct users deliberately do NOT appear here:
    countDistinct is not distributive over partials — route distinct
    questions to the mergeable HLL sketch table (sketch_hll_windowed)
    or recompute from raw for the exact answer."""
    return (
        hourly.groupBy(
            F.date_format(
                F.date_trunc(granularity, F.col("hour").cast("timestamp")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("period"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_v"), 4).alias("sum_v"),
        )
    )


def detect_stale_hours(
    spark: SparkSession, path: str, raw: DataFrame
) -> list[str | None]:
    """Audit the materialized rollup against raw: an hour is STALE when
    its raw row count disagrees with the rollup's `n` total (covers
    late-arriving rows, reprocessed files, and hours missing entirely).
    Returns stale hour keys sorted ascending; a stale NULL-hour
    partition (null-ts rows) is reported as a trailing ``None`` element,
    matching refresh_rollup's touched-key convention.
    Cost: one map-side-combined count per side on the hour key — no
    joins over facts, no value comparison needed (any row change moves
    the count; a same-count value corruption is what the shard-manifest
    checksum audit exists for). Pair with refresh_rollup(touched) for
    detect-and-repair."""
    raw_counts = raw.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour")
    ).agg(F.count("*").alias("raw_n"))
    roll_counts = (
        spark.read.parquet(path)
        .withColumn(
            "hour", F.date_format(F.col("hour").cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
        )
        .groupBy("hour")
        .agg(F.sum("n").alias("roll_n"))
    )
    # null-hour partition (null-ts rows): a plain full join never matches
    # null keys, so an in-sync null partition would read as stale on BOTH
    # sides forever — join null-safe and coalesce the key back together
    stale = (
        raw_counts.join(
            roll_counts,
            raw_counts["hour"].eqNullSafe(roll_counts["hour"]),
            "full",
        )
        .filter(
            F.col("roll_n").isNull()
            | F.col("raw_n").isNull()
            | (F.col("raw_n") != F.col("roll_n"))
        )
        .select(F.coalesce(raw_counts["hour"], roll_counts["hour"]).alias("hour"))
        .collect()
    )
    hours = [r["hour"] for r in stale]
    non_null = [h for h in hours if h is not None]
    # None sorts last, matching refresh_rollup's touched-key convention
    return sorted(non_null) + ([None] if len(non_null) < len(hours) else [])
