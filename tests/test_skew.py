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
    prev_abcast = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # the shipped policy hands broadcast to AQE's runtime threshold —
    # disable that too so the shuffle-join skew path under test is the
    # one that executes
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
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
        if prev_abcast is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_abcast
            )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
    assert (naive.n, naive.s) == (salted.n, salted.s)
    assert naive.n == 4_000_000
    print(f"skew stress: naive={t_naive:.2f}s salted={t_salted:.2f}s")
    if t_salted > t_naive * 1.2:
        pytest.fail(f"salted join slower than naive: {t_salted:.2f}s vs {t_naive:.2f}s")


def test_aqe_skew_split_fires_and_bounds_runtime(spark):
    """Adversarial skew stress for the AQE path (the production default;
    salting is the fallback when runtime stats miss): 10% of 4M probe
    rows on ONE key, joined sort-merge against a 100k-key build side.
    Asserts (a) AQE actually splits the hot partition — the final plan
    carries SortMergeJoin(skew=true) and an AQEShuffleRead skewed — and
    (b) wall time stays bounded vs the same-volume UNSKEWED join (the
    degenerate single-straggler serialization would be ~10× at this
    skew). Thresholds are scaled to test data size (the hot partition is
    ~6 MB; production defaults target 256 MB partitions).

    Timing bound is lenient (2×) for a shared machine; the load-bearing
    asserts are the plan markers + row counts."""
    import time

    import pytest

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # the shipped policy's AQE runtime threshold would convert the
        # constructed SMJ to broadcast before skew-split could fire
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # 32 partitions so the hot partition (~10% of rows + its uniform
        # share) clears factor × median; the shared pytest session runs 8
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)

    def probe(skewed: bool):
        hot = F.when(F.col("id") % 10 < 1, 0)
        key = (
            hot.otherwise(F.pmod(F.xxhash64("id"), F.lit(100_000)))
            if skewed
            else F.pmod(F.xxhash64("id"), F.lit(100_000))
        )
        return spark.range(0, 4_000_000).select(
            key.alias("k"), F.col("id").alias("payload")
        )

    right = spark.range(0, 100_000).select(
        F.col("id").alias("rk"), (F.col("id") * 2).alias("val")
    )

    def run(skewed: bool):
        # sum(payload) keeps the payload column in the shuffle (a
        # count-only agg prunes it, halving partition bytes below the
        # test's skew threshold)
        agg = (
            probe(skewed)
            .join(right, F.col("k") == F.col("rk"))
            .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
        )
        t0 = time.monotonic()
        n = agg.collect()[0].n
        dt = time.monotonic() - t0
        plan = agg._jdf.queryExecution().executedPlan().toString()
        return n, dt, plan

    try:
        # untimed warmup: the first execution of this plan shape pays
        # whole-stage-codegen compilation; without it the ratio below
        # compares (compile + skewed run) against a warm uniform run and
        # flakes on shared machines
        run(skewed=False)
        n_skew, t_skew, plan_skew = run(skewed=True)
        n_uni, t_uni, _ = run(skewed=False)
        if t_skew > t_uni * 2.0:
            # one retry while confs are still set: a transient CPU spike
            # (another JVM on the shared machine) distorts either side;
            # the plan markers below already prove the split happened
            n2, t_skew, _ = run(skewed=True)
            _, t_uni, _ = run(skewed=False)
            assert n2 == 4_000_000
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert n_skew == 4_000_000 and n_uni == 4_000_000
    # AQE recognized and split the hot partition
    assert "skew=true" in plan_skew, plan_skew[:2000]
    assert "AQEShuffleRead skewed" in plan_skew
    print(f"aqe skew stress: skewed={t_skew:.2f}s uniform={t_uni:.2f}s")
    if t_skew > t_uni * 2.0:
        pytest.fail(f"skewed join not bounded: {t_skew:.2f}s vs uniform {t_uni:.2f}s")


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


def test_null_split_left_join_equals_plain_and_skips_shuffle_for_nulls(spark):
    """null_split_left_join must be (a) result-identical to the plain
    LEFT join including multiplicities and null-extension, and (b) a
    genuine rewrite: the physical plan unions a join branch with a
    join-free null branch, and the join branch filters the null keys
    out before its exchange."""
    from ballista_mvp_spark.operators.skew import null_split_left_join

    li = load_table(spark, SF_SMALL, "lineitem").select(
        F.when(F.col("l_linenumber") >= 5, F.lit(None))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_quantity",
        "l_extendedprice",
    )
    o = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    split = null_split_left_join(li, o, ["k"])
    plain = li.join(o, ["k"], "left")

    def bag(df):
        out = {}
        for r in df.collect():
            t = tuple(r)
            out[t] = out.get(t, 0) + 1
        return out

    assert bag(split) == bag(plain)
    # the fact table really is skewed: a nontrivial share of keys is null
    n_null = li.filter(F.col("k").isNull()).count()
    assert n_null > 0.2 * li.count()

    # Catalyst pushes the nullness split all the way into the two file
    # scans (the filters surface as rewritten CASE scan predicates), the
    # null branch carries NO join, and the plan holds exactly one join.
    plan = split._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both; assert the final
    assert "Union" in final
    n_joins = sum(final.count(j) for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))
    assert n_joins == 1, final
    assert "isnull(l_orderkey" in final  # the join-free null branch's scan filter

    # left-only key (no matching order) still null-extends, null keys too
    row_groups = split.groupBy(F.col("k").isNull().alias("isnull")).count().collect()
    assert {r.isnull for r in row_groups} == {True, False}


def test_null_split_left_join_rejects_non_left(spark):
    from ballista_mvp_spark.operators.skew import null_split_left_join

    li = load_table(spark, SF_SMALL, "lineitem").limit(1)
    with pytest.raises(ValueError):
        null_split_left_join(li, li, ["l_orderkey"], how="inner")


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's OptimizeSkewedJoin — the runtime complement of the manual
    salting operators in this module: with a 90%-hot key, the finalized
    adaptive plan must mark the sort-merge join skew-handled
    (skew=true), splitting the hot partition into subpartitions, and
    the result must equal the non-adaptive join. Thresholds are forced
    tiny because the trigger is partition BYTES; at production scale the
    defaults (256 MB threshold, 5x median factor) do the same thing."""
    from pyspark.sql import functions as F

    s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    left = s.range(200000).select(
        F.when(F.col("id") % 10 == 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = s.range(5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    j = left.join(right, "k")
    # collect() (not count()) so THIS DataFrame's query execution is the
    # one finalized by AQE — count() runs a separate execution
    got = len(j.collect())
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan
    # result identity: 20000 rows via hot key 0 + 4500 singleton matches
    assert got == 24500


def test_salted_ops_reject_empty_salt_source(spark):
    """Every column being a key (agg) or the key being the only column
    (join) leaves nothing to derive the salt from — a clear ValueError
    beats xxhash64's zero-arg analysis error."""
    import pytest

    from ballista_mvp_spark.operators import skew as S

    df = spark.createDataFrame([(1,), (2,)], ["k"])
    with pytest.raises(ValueError, match="salted_agg: no columns"):
        S.salted_agg(df, ["k"], {"n": ("count", "k")})
    with pytest.raises(ValueError, match="salted_join: no probe-side"):
        S.salted_join(df, df.withColumnRenamed("k", "k2"), "k", "k2")
