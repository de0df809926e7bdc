"""Incremental materialized-rollup refresh (operators/rollup.py):
refreshed table equals a full recompute, untouched partitions stay
byte-identical, replayed deltas are idempotent."""

from __future__ import annotations

import glob
import hashlib

from pyspark.sql import functions as F

from ballista_mvp_spark.operators import rollup as R
from ballista_mvp_spark.tables import load_table

from .conftest import SF_SMALL


def _hashes(path):
    out = {}
    for f in glob.glob(path + "/hour=*/*.parquet"):
        with open(f, "rb") as fh:
            out[f] = hashlib.md5(fh.read()).hexdigest()
    return out


def _normalize(df):
    return {tuple(r) for r in df.select("hour", "event_type", "n", "sum_v", "n_users").collect()}


def test_refresh_touches_only_delta_hours_and_matches_full(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    cutoff = ev.approxQuantile("event_id", [0.8], 0.0)[0]
    base = ev.filter(F.col("event_id") <= cutoff)
    delta = ev.filter(F.col("event_id") > cutoff)
    path = str(tmp_path / "rollup")

    R.materialize_rollup(base, path)
    before = _hashes(path)

    touched = R.refresh_rollup(spark, path, raw=ev, delta=delta)
    assert touched
    # equality with a full recompute over all raw rows
    got = _normalize(
        spark.read.parquet(path).withColumn(
            "hour", F.date_format(F.col("hour").cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
        )
    )
    assert got == _normalize(R.hourly_rollup(ev))
    # untouched hour partitions byte-stable
    after = _hashes(path)
    for f, h in before.items():
        hour = f.split("hour=")[1].split("/")[0]
        from urllib.parse import unquote

        if unquote(hour) not in touched:
            assert after.get(f) == h, f
    # replaying the same delta is a no-op in content
    R.refresh_rollup(spark, path, raw=ev, delta=delta)
    got2 = _normalize(
        spark.read.parquet(path).withColumn(
            "hour", F.date_format(F.col("hour").cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
        )
    )
    assert got2 == got
    # empty delta refreshes nothing
    assert R.refresh_rollup(spark, path, raw=ev, delta=delta.limit(0)) == []


def test_reaggregate_from_hourly_equals_direct(spark, tmp_path):
    """Daily re-aggregation of the hourly rollup must equal the direct
    daily rollup over raw for the distributive aggregates."""
    ev = load_table(spark, SF_SMALL, "events")
    path = str(tmp_path / "rollup")
    R.materialize_rollup(ev, path)
    hourly = spark.read.parquet(path).withColumn(
        "hour", F.date_format(F.col("hour").cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
    )
    via_rollup = {
        tuple(r) for r in R.reaggregate_rollup(hourly, "day").collect()
    }
    direct = {
        tuple(r)
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss").alias("period"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .collect()
    }
    assert via_rollup == direct


def test_detect_and_repair_stale_hours(spark, tmp_path):
    """Rollup built from 70% of rows: detect_stale_hours must flag
    exactly the hours whose raw count moved, and refreshing those hours
    must bring the audit back to empty and the table to full equality."""
    ev = load_table(spark, SF_SMALL, "events")
    cutoff = ev.approxQuantile("event_id", [0.7], 0.0)[0]
    base = ev.filter(F.col("event_id") <= cutoff)
    delta = ev.filter(F.col("event_id") > cutoff)
    path = str(tmp_path / "rollup")
    R.materialize_rollup(base, path)

    stale = R.detect_stale_hours(spark, path, raw=ev)
    expected_stale = sorted(
        r.hour
        for r in delta.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour")
        ).distinct().collect()
    )
    assert stale == expected_stale and stale

    # repair exactly the flagged hours
    hour_col = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
    R.refresh_rollup(spark, path, raw=ev, delta=ev.filter(hour_col.isin(stale)))
    assert R.detect_stale_hours(spark, path, raw=ev) == []
    got = _normalize(
        spark.read.parquet(path).withColumn(
            "hour", F.date_format(F.col("hour").cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
        )
    )
    assert got == _normalize(R.hourly_rollup(ev))


def test_refresh_handles_null_ts_partition(spark, tmp_path):
    """Delta rows with a null ts land in the null-hour partition; the
    refresh must actually recompute it (isin([None]) matches nothing)
    and must not crash sorting str/None."""
    from pyspark.sql import functions as F

    from ballista_mvp_spark.operators import rollup as R

    base = spark.createDataFrame(
        [("2024-01-01 03:10:00", "click", 1.0, 10)],
        "ts_s string, event_type string, value double, user_id long",
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value", "user_id"
    )
    nulls = spark.createDataFrame(
        [(None, "click", 2.0, 11), (None, "view", 3.0, 12)],
        "ts_s string, event_type string, value double, user_id long",
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value", "user_id"
    )
    raw = base.unionByName(nulls)
    path = str(tmp_path / "roll")
    R.refresh_rollup(spark, path, raw, base)  # seed the real hour
    touched = R.refresh_rollup(spark, path, raw, nulls.unionByName(base))
    assert touched[-1] is None and touched[0] == "2024-01-01 03:00:00"
    got = spark.read.parquet(path)
    assert got.filter(F.col("hour").isNull()).count() > 0  # null partition real


def test_detect_stale_handles_null_ts_partition(spark, tmp_path):
    """Audit over a corpus with a null-ts partition: an IN-SYNC null-hour
    partition must NOT be flagged (plain full joins never match null
    keys — the audit joins null-safe), a stale one must be flagged as
    None without the str/None sort crash, and refresh must clear it."""
    from pyspark.sql import functions as F

    from ballista_mvp_spark.operators import rollup as R

    def _mk(rows):
        return spark.createDataFrame(
            rows, "ts_s string, event_type string, value double, user_id long"
        ).select(
            F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type",
            "value",
            "user_id",
        )

    raw = _mk(
        [
            ("2024-01-01 03:10:00", "click", 1.0, 10),
            (None, "click", 2.0, 11),
            (None, "view", 3.0, 12),
        ]
    )
    path = str(tmp_path / "roll")
    R.materialize_rollup(raw, path)
    # in sync (null partition included): nothing stale
    assert R.detect_stale_hours(spark, path, raw=raw) == []
    # two more null-ts rows arrive: ONLY the null partition is stale
    raw2 = raw.unionByName(_mk([(None, "click", 4.0, 13)]))
    assert R.detect_stale_hours(spark, path, raw=raw2) == [None]
    # detect-and-repair: refresh the flagged partition, audit goes green
    R.refresh_rollup(spark, path, raw=raw2, delta=raw2.filter(F.col("ts").isNull()))
    assert R.detect_stale_hours(spark, path, raw=raw2) == []
