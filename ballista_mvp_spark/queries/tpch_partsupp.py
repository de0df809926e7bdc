"""Faithful-shape TPC-H Q2/Q9/Q11/Q16/Q20 over a synthesized partsupp.

The reference's TPC-H test schema includes partsupp
(ballista/scheduler/src/test_utils.rs:145-238: ps_partkey, ps_suppkey,
ps_availqty, ps_supplycost), but the synthetic testdata has no partsupp
parquet — the adapted q2/q9/q11/q16/q20 in tpch.py derive supply facts
from lineitem instead, which changes the canonical join shape. This
module restores the faithful shape: partsupp is synthesized
DETERMINISTICALLY from lineitem's distinct (l_partkey, l_suppkey) pairs
with seeded availqty/supplycost that are pure integer functions of the
keys, so DuckDB builds the identical table from the identical rule and
the value-hash gate applies end-to-end.

Synthesis rule (all integer arithmetic — bit-exact in both engines):
    ps_availqty         = (l_partkey*37 + l_suppkey*101) % 9999 + 1
    ps_supplycost_cents = (l_partkey*13 + l_suppkey*7) % 99900 + 100
    ps_supplycost       = cents / 100.0          # [1.00, 1000.99)
Money aggregates run on integer cents (the q7/_cents_sum convention), so
cross-engine comparisons never depend on float accumulation order.

Scale notes: partsupp at TPC-H SF100k is ~80B rows — NOT broadcastable.
Joins against it shuffle on ps_partkey (q2/q11/q16) or the composite
(partkey, suppkey) (q9/q20); dimension sides (part, supplier, nation,
region) stay broadcast. The synthesis itself is one distinct-agg over
lineitem's two key columns (map-side combined), the same cost class as
any fact-fact join preparation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tpch import _cents_sum, _t

PARTSUPP_CTE = """
partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         (l_partkey * 37 + l_suppkey * 101) % 9999 + 1 AS ps_availqty,
         (l_partkey * 13 + l_suppkey * 7) % 99900 + 100 AS ps_supplycost_cents,
         ((l_partkey * 13 + l_suppkey * 7) % 99900 + 100) / 100.0 AS ps_supplycost
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
)"""


def partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized partsupp table (see module docstring for the rule).
    ≅ reference test_utils.rs partsupp schema."""
    pairs = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    cents = (F.col("l_partkey") * 13 + F.col("l_suppkey") * 7) % 99900 + 100
    return pairs.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        ((F.col("l_partkey") * 37 + F.col("l_suppkey") * 101) % 9999 + 1).alias(
            "ps_availqty"
        ),
        cents.alias("ps_supplycost_cents"),
        (cents / 100.0).alias("ps_supplycost"),
    )


def q2_partsupp(spark, sf_dir):
    """Canonical Q2: minimum-supplycost supplier per part in a region —
    partsupp join chain + correlated per-part MIN (reference
    test_utils.rs:145-238 schema). The correlated MIN is a window over
    ps_partkey (one shuffle, reused by the equality filter); the min
    comparison runs on integer cents, not doubles."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation")
    eu_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(eu_nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    )
    ps = partsupp(spark, sf_dir)
    eligible = (
        ps.join(part.select("p_partkey", "p_name"), ps.ps_partkey == F.col("p_partkey"))
        .join(supp, ps.ps_suppkey == supp.s_suppkey)
    )
    w = Window.partitionBy("ps_partkey")
    best = eligible.withColumn(
        "_mn", F.min("ps_supplycost_cents").over(w)
    ).filter(F.col("ps_supplycost_cents") == F.col("_mn"))
    return (
        best.select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round(F.col("ps_supplycost_cents") / 100.0, 2).alias("ps_supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_PARTSUPP_ORACLE = f"""
WITH {PARTSUPP_CTE},
elig AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
         ps_supplycost_cents
  FROM partsupp
  JOIN part ON p_partkey = ps_partkey
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'SMALL' AND p_size <= 15)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       round(ps_supplycost_cents / 100.0, 2) AS ps_supplycost
FROM elig
WHERE ps_supplycost_cents = (SELECT min(ps_supplycost_cents) FROM elig e2
                             WHERE e2.p_partkey = elig.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q9_partsupp(spark, sf_dir):
    """Canonical Q9: product-type profit by nation and year with real
    ps_supplycost — profit = revenue − ps_supplycost·l_quantity. The
    lineitem↔partsupp join is the faithful composite-key fact-fact join
    (shuffles on (partkey, suppkey)); part/supplier/nation broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    ps = partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        li.join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_cents_sum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_PARTSUPP_ORACLE = f"""
WITH {PARTSUPP_CTE}
SELECT n_name AS nation, CAST(date_part('year', o_orderdate) AS INT) AS o_year,
       sum(CAST(round((l_extendedprice * (1 - l_discount)
                       - ps_supplycost * l_quantity) * 100) AS BIGINT)) / 100.0 AS sum_profit
FROM lineitem
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q11_partsupp(spark, sf_dir):
    """Canonical Q11: inventory value concentration —
    sum(ps_supplycost·ps_availqty) per part over one region's suppliers,
    HAVING > 2× the average per-part value. Pure integer cents
    arithmetic; the scalar total is a 1-row broadcast.

    Threshold: the spec's fixed-fraction HAVING (0.1% of total) empties
    as part count grows — it certified on a vacuous 0=0 at sf0.1. The
    spec scales its fraction by 1/SF; the scale-free equivalent is an
    average-relative threshold (see tpch.q11), kept in pure int64
    (vc·n > 2·total, no float ratio at the boundary)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    ps = partsupp(spark, sf_dir)
    val = (
        ps.join(supp.select("s_suppkey"), ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents").cast("long") * F.col("ps_availqty")).alias(
                "_vc"
            )
        )
    )
    total = val.agg(F.sum("_vc").alias("_tot"), F.count(F.lit(1)).alias("_n"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("_vc") * F.col("_n") > F.col("_tot") * 2)
        .select("ps_partkey", (F.col("_vc") / 100.0).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


Q11_PARTSUPP_ORACLE = f"""
WITH {PARTSUPP_CTE},
val AS (
  SELECT ps_partkey,
         sum(CAST(ps_supplycost_cents AS BIGINT) * ps_availqty) AS vc
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY 1)
SELECT ps_partkey, vc / 100.0 AS part_value
FROM val
WHERE CAST(vc AS BIGINT) * (SELECT count(*) FROM val)
      > (SELECT CAST(sum(vc) AS BIGINT) FROM val) * 2
ORDER BY part_value DESC, ps_partkey
"""


def q16_partsupp(spark, sf_dir):
    """Canonical Q16: supplier count per (brand, type, size) from
    partsupp — the faithful source of part↔supplier relationships —
    excluding a supplier blocklist (complaint filter proxied by
    s_acctbal < 0; no comment column in the synthetic schema)."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 20)
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    ps = partsupp(spark, sf_dir)
    return (
        ps.join(part, ps.ps_partkey == part.p_partkey)
        .join(bad_supp, ps.ps_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_PARTSUPP_ORACLE = f"""
WITH {PARTSUPP_CTE}
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand != 'Brand#1' AND p_type != 'PROMO' AND p_size <= 20
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_partsupp(spark, sf_dir):
    """Canonical Q20: suppliers holding excess stock of a part family —
    ps_availqty > 50% of the 1995 shipped quantity for that
    (part, supplier) pair; qualifying suppliers semi-joined into one
    region's supplier list. The pair-quantity aggregate shuffles on the
    composite key; partsupp joins it on the same key (exchange reuse)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    ps = partsupp(spark, sf_dir)
    qualifying = (
        ps.join(part.select("p_partkey"), ps.ps_partkey == F.col("p_partkey"))
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(
            qualifying, supp.s_suppkey == qualifying.ps_suppkey, "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_PARTSUPP_ORACLE = f"""
WITH {PARTSUPP_CTE},
shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY 1, 2)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    WHERE starts_with(p_name, 'small') AND ps_availqty > 0.5 * qty)
ORDER BY s_name
"""


QUERIES = {
    "tpch_q2_partsupp": q2_partsupp,
    "tpch_q9_partsupp": q9_partsupp,
    "tpch_q11_partsupp": q11_partsupp,
    "tpch_q16_partsupp": q16_partsupp,
    "tpch_q20_partsupp": q20_partsupp,
}

ORACLES = {
    "tpch_q2_partsupp": Q2_PARTSUPP_ORACLE,
    "tpch_q9_partsupp": Q9_PARTSUPP_ORACLE,
    "tpch_q11_partsupp": Q11_PARTSUPP_ORACLE,
    "tpch_q16_partsupp": Q16_PARTSUPP_ORACLE,
    "tpch_q20_partsupp": Q20_PARTSUPP_ORACLE,
}
