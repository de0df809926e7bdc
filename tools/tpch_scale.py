"""TPC-H fact-table scale check: do the certified join/agg plans hold
when the FACTS grow 10x and the dimensions stay fixed?

Usage: python tools/tpch_scale.py [multiplier]   (default: 10)

Replicates lineitem + orders N zx with shifted order keys (each copy is a
disjoint key range, so per-order aggregates and order-grain joins grow
linearly and no artificial key collisions appear), keeps the dimension
tables as-is, writes the scaled instance to a temp dir, and times the
certified registry queries against BOTH instances in one session. This
is the empirical leg of SCALE.md's "Relational core" table: Q1's
map-side partial agg should scale with I/O, the broadcast dims of
Q3/Q5/Q10 must NOT flip to shuffle joins (dimensions did not grow), and
Q18's order-grain groupBy shuffles 10x the rows.

Results recorded in SCALE.md "Measured scaling".
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ballista_mvp_spark.queries import ALL_QUERIES
from ballista_mvp_spark.session import build_session
from ballista_mvp_spark.tables import load_table

QUERIES = ["tpch_q1", "tpch_q3", "tpch_q5", "tpch_q10", "tpch_q18", "count_star"]
DIMS = ["region", "nation", "customer", "supplier", "part", "partsupp"]
KEY_SHIFT = 1_000_000_000


def build_scaled(spark, sf_dir: str, out_dir: str, mult: int) -> None:
    copies = spark.range(mult).select(F.col("id").alias("_copy"))
    shift = F.col("_copy") * F.lit(KEY_SHIFT)
    li = load_table(spark, sf_dir, "lineitem")
    (
        li.crossJoin(F.broadcast(copies))
        .withColumn("l_orderkey", F.col("l_orderkey") + shift)
        .drop("_copy")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "lineitem.parquet"))
    )
    o = load_table(spark, sf_dir, "orders")
    (
        o.crossJoin(F.broadcast(copies))
        .withColumn("o_orderkey", F.col("o_orderkey") + shift)
        .drop("_copy")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "orders.parquet"))
    )
    for t in DIMS:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            load_table(spark, sf_dir, t).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{t}.parquet")
            )


def grow_dim(spark, sf_dir: str, out_dir: str, mult: int) -> None:
    """Inverse stress (round-8 unpin verification): grow the
    FORMERLY-PINNED join side (customer) ×mult with DISJOINT custkeys —
    new customers match no orders, so inner-join results are unchanged
    by construction — and copy every other table as-is. At small mult
    the un-hinted q3 still plans BroadcastHashJoin (size estimate under
    the threshold); past it, the SAME code degrades to a shuffle join
    instead of forcing an ever-larger broadcast. That graceful flip IS
    the behavior the removed pins used to break."""
    copies = spark.range(mult).select(F.col("id").alias("_copy"))
    shift = F.col("_copy") * F.lit(KEY_SHIFT)
    c = load_table(spark, sf_dir, "customer")
    (
        c.crossJoin(F.broadcast(copies))
        .withColumn("c_custkey", F.col("c_custkey") + shift)
        .drop("_copy")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "customer.parquet"))
    )
    for t in ["region", "nation", "supplier", "part", "partsupp", "orders",
              "lineitem"]:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            load_table(spark, sf_dir, t).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{t}.parquet")
            )


def _join_nodes(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sorted(
        {
            line.strip().lstrip("*:+- (0123456789)")[:22]
            for line in plan.splitlines()
            if "HashJoin" in line or "SortMergeJoin" in line
        }
    )


def dim_main(mults: list[int]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("tpch-dim-scale")
    fn = ALL_QUERIES["tpch_q3"]
    base = fn(spark, sf_dir)
    n_base = base.count()
    print(f"q3 base: rows={n_base} joins={_join_nodes(base)}", flush=True)
    for mult in mults:
        out_dir = tempfile.mkdtemp(prefix="tpch_dim_")
        try:
            grow_dim(spark, sf_dir, out_dir, mult)
            df = fn(spark, out_dir)
            t0 = time.perf_counter()
            n = df.count()
            dt = time.perf_counter() - t0
            assert n == n_base, (n, n_base)  # disjoint keys: result invariant
            print(
                f"q3 customer x{mult:<4}: {dt:5.2f}s rows={n} "
                f"joins={_join_nodes(df)}",
                flush=True,
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--dim":
        dim_main([int(x) for x in sys.argv[2:]] or [8, 64, 256])
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = build_session("tpch-scale")
    out_dir = tempfile.mkdtemp(prefix="tpch_scaled_")
    try:
        t0 = time.perf_counter()
        build_scaled(spark, sf_dir, out_dir, mult)
        print(f"built x{mult} instance in {time.perf_counter() - t0:.1f}s", flush=True)
        for name in QUERIES:
            fn = ALL_QUERIES[name]
            t0 = time.perf_counter()
            n1 = fn(spark, sf_dir).count()
            d1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            n2 = fn(spark, out_dir).count()
            d2 = time.perf_counter() - t0
            print(
                f"{name:<12} x1: {d1:5.2f}s/{n1:<7} x{mult}: {d2:5.2f}s/{n2:<8}"
                f" growth x{d2 / d1:.1f}",
                flush=True,
            )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
