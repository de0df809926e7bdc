"""Salted aggregation/join equivalence tests — skewed results must equal
the unsalted plans exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_mvp_spark.operators.skew import salted_agg, salted_join
from ballista_mvp_spark.tables import load_table

from .conftest import SF_SMALL


def test_salted_agg_equals_plain(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    plain = {
        (r.l_returnflag, r.s, r.c, r.mn, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count("l_partkey").alias("c"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.s, r.c, r.mn, r.mx)
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "s": ("sum", "l_quantity"),
                "c": ("count", "l_partkey"),
                "mn": ("min", "l_extendedprice"),
                "mx": ("max", "l_extendedprice"),
            },
            n_salt=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_nonalgebraic(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    with pytest.raises(ValueError, match="unsupported"):
        salted_agg(li, ["l_returnflag"], {"a": ("avg", "l_quantity")})


def test_skew_stress_salted_vs_naive(spark):
    """Wall-time evidence for the SCALE.md skew claims, on a deliberately
    skewed dataset (4M rows, 60% on one key; 5k-key build side, broadcast
    disabled to emulate a build side too large to broadcast):

    - salted_join must produce IDENTICAL results to the naive join, and
    - with AQE's skew-join splitting off (pre-AQE engines / runtime-stats
      miss), the salted plan must not be slower than naive — measured
      2026-08-13 on local[32]: naive 2.5s, salted 1.6s, AQE skew-split
      1.2s (numbers recorded in SCALE.md).

    The timing assert is lenient (<= 1.2x naive) because this machine is
    shared; the load-bearing asserts are result equality + the recorded
    profile."""
    import os
    import time

    import pytest

    from ballista_mvp_spark.operators.skew import salted_join

    scratch = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")
    os.makedirs(scratch, exist_ok=True)
    lpath, rpath = os.path.join(scratch, "skew_left"), os.path.join(scratch, "skew_right")
    spark.range(0, 4_000_000).select(
        F.when(F.col("id") % 10 < 6, 0)
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(5000)))
        .alias("k"),
        F.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(lpath)
    spark.range(0, 5000).select(
        F.col("id").alias("rk"), (F.col("id") * 2).alias("val")
    ).write.mode("overwrite").parquet(rpath)
    left = spark.read.parquet(lpath)
    right = spark.read.parquet(rpath)

    def rollup(df):
        return df.select(
            F.count("*").alias("n"), F.sum(F.col("payload") + F.col("val")).alias("s")
        ).head()

    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        t0 = time.monotonic()
        naive = rollup(left.join(right, left.k == right.rk))
        t_naive = time.monotonic() - t0
        t0 = time.monotonic()
        salted = rollup(salted_join(left, right, "k", "rk", n_salt=16))
        t_salted = time.monotonic() - t0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
    assert (naive.n, naive.s) == (salted.n, salted.s)
    assert naive.n == 4_000_000
    print(f"skew stress: naive={t_naive:.2f}s salted={t_salted:.2f}s")
    if t_salted > t_naive * 1.2:
        pytest.fail(f"salted join slower than naive: {t_salted:.2f}s vs {t_naive:.2f}s")


def test_salted_join_equals_plain(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    cust = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(orders, cust, "o_custkey", "c_custkey", n_salt=4)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
