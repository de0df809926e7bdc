"""Relational-core certification queries — SURVEY.md §2.3-2.5 rows.

One oracle-checked query per declared operator: projection, filter,
limit/offset, sort (incl. null ordering + top-k), all 8 join types +
null-safe equality + residual filters + cross join, distinct, union
(all/dedup), intersect/except, the 19 aggregate functions with
DISTINCT/FILTER modifiers, and GROUPING SETS / CUBE / ROLLUP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators import joins as J
from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# -- projection / filter / limit / sort (datafusion.proto:134-152, 280-286) --


def projection(spark, sf_dir):
    """ProjectionExecNode (datafusion.proto:1219-1223): expr list + alias."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lno"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        (F.col("l_quantity") * 2 + 1).alias("qty2"),
        (-F.col("l_tax")).alias("neg_tax"),
    )


PROJECTION_ORACLE = """
SELECT l_orderkey AS okey, l_linenumber AS lno,
       l_extendedprice * (1 - l_discount) AS net,
       l_quantity * 2 + 1 AS qty2, -l_tax AS neg_tax
FROM lineitem
"""


def filter_pred(spark, sf_dir):
    """FilterExecNode (datafusion.proto:1130-1133) with the §2.7 predicate
    forms: AND/OR/NOT, BETWEEN, IN, LIKE, IS NULL on a derived column."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        (
            (F.col("o_totalprice").between(1000, 50000) & (F.col("o_orderstatus") == "O"))
            | (F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") & ~F.col("o_orderstatus").isin("P"))
        )
        & F.col("o_orderpriority").like("%-%")
        & F.nullif(F.col("o_orderstatus"), F.lit("F")).isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


FILTER_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE ((o_totalprice BETWEEN 1000 AND 50000 AND o_orderstatus = 'O')
       OR (o_orderpriority IN ('1-URGENT', '2-HIGH') AND NOT o_orderstatus IN ('P')))
  AND o_orderpriority LIKE '%-%'
  AND nullif(o_orderstatus, 'F') IS NOT NULL
"""


def limit_offset(spark, sf_dir):
    """GlobalLimit/LocalLimit with skip (datafusion.proto:280-286,
    1251-1262): OFFSET 100 LIMIT 25 over a total order."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").offset(100).limit(25)
    )


LIMIT_OFFSET_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 25 OFFSET 100
"""


def sort_topk(spark, sf_dir):
    """Sort with fetch = top-k (datafusion.proto:147-152 `fetch`): Spark
    compiles orderBy+limit to TakeOrderedAndProject — per-partition heap,
    no global sort; the scale-correct plan."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(15)
    )


SORT_TOPK_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
"""


def sort_nulls(spark, sf_dir):
    """Null-ordering parity (SURVEY.md M1 risk: DataFusion ASC⇒NULLS LAST,
    Spark ASC⇒NULLS FIRST — must be pinned explicitly on both sides)."""
    o = _t(spark, sf_dir, "orders")
    withn = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("st"),
        "o_totalprice",
    )
    return withn.orderBy(
        F.col("st").asc_nulls_last(), F.col("o_totalprice").desc_nulls_first(), F.col("o_orderkey")
    ).limit(50)


SORT_NULLS_ORACLE = """
SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st, o_totalprice
FROM orders
ORDER BY st ASC NULLS LAST, o_totalprice DESC NULLS FIRST, o_orderkey
LIMIT 50
"""


# -- joins (datafusion.proto:240-278; SURVEY.md §2.4) ------------------------


def join_inner(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        J.join(o, c, o.o_custkey == c.c_custkey, "inner", broadcast_right=True)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("c_mktsegment")
    )


JOIN_INNER_ORACLE = """
SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def join_left(spark, sf_dir):
    """LEFT outer: customers with no orders survive null-extended."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        J.join(c, o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_no_order"),
        )
        .orderBy("c_mktsegment")
    )


JOIN_LEFT_ORACLE = """
SELECT c_mktsegment, count(*) AS n_rows, count(o_orderkey) AS n_orders,
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_order
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
  ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def join_right(spark, sf_dir):
    """RIGHT outer — same relation as join_left with sides swapped."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        J.join(o, c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_rows"), F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_mktsegment")
    )


JOIN_RIGHT_ORACLE = """
SELECT c_mktsegment, count(*) AS n_rows, count(o_orderkey) AS n_orders
FROM (SELECT * FROM orders WHERE o_totalprice > 150000) o RIGHT JOIN customer
  ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def join_full(spark, sf_dir):
    """FULL outer join of per-nation customer vs supplier counts."""
    c = _t(spark, sf_dir, "customer").groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    s = _t(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    return (
        J.join(c, s, c.c_nationkey == s.s_nationkey, "full")
        .select(
            F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nkey"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
        .orderBy("nkey")
    )


JOIN_FULL_ORACLE = """
SELECT coalesce(c_nationkey, s_nationkey) AS nkey,
       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
  ON c_nationkey = s_nationkey
ORDER BY nkey
"""


def join_semi(spark, sf_dir):
    """LEFTSEMI (datafusion.proto:245): parts referenced by any
    lineitem with quantity above 45 (the build-side filter keeps the
    semi join selective — without it every part qualifies and the semi
    join is vacuous)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        J.join(p, li, p.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_type")
        .agg(F.count("*").alias("n"))
        .orderBy("p_type")
    )


JOIN_SEMI_ORACLE = """
SELECT p_type, count(*) AS n FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
GROUP BY p_type ORDER BY p_type
"""


def join_anti(spark, sf_dir):
    """LEFTANTI (datafusion.proto:246): parts never ordered at qty > 45."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        J.join(p, li, p.p_partkey == li.l_partkey, "left_anti")
        .groupBy("p_type")
        .agg(F.count("*").alias("n"))
        .orderBy("p_type")
    )


JOIN_ANTI_ORACLE = """
SELECT p_type, count(*) AS n FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
GROUP BY p_type ORDER BY p_type
"""


def join_right_semi(spark, sf_dir):
    """RIGHTSEMI (datafusion.proto:247) = LEFTSEMI with inputs swapped
    (ballista_mvp_spark.operators.joins.join handles the swap)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    p = _t(spark, sf_dir, "part")
    return (
        J.join(li, p, li.l_partkey == p.p_partkey, "right_semi")
        .groupBy("p_type")
        .agg(F.count("*").alias("n"))
        .orderBy("p_type")
    )


def join_right_anti(spark, sf_dir):
    """RIGHTANTI (datafusion.proto:248) = LEFTANTI with inputs swapped."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    p = _t(spark, sf_dir, "part")
    return (
        J.join(li, p, li.l_partkey == p.p_partkey, "right_anti")
        .groupBy("p_type")
        .agg(F.count("*").alias("n"))
        .orderBy("p_type")
    )


def join_cross(spark, sf_dir):
    """CrossJoinNode (datafusion.proto:275-278)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    # nation (25 rows, spec-fixed) broadcasts explicitly: with the
    # shipped static-threshold-off policy an un-hinted cross join plans
    # CartesianProduct; the pin keeps the BroadcastNestedLoopJoin shape
    # (dimension-class, bounded by spec at any corpus scale)
    return (
        J.join(r, n, None, "cross", broadcast_right=True)
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


JOIN_CROSS_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
"""


def join_nullsafe(spark, sf_dir):
    """null_equals_null (datafusion.proto:263) → Spark `<=>` / DuckDB
    IS NOT DISTINCT FROM, over keys made nullable with nullif."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    )
    segs = (
        _t(spark, sf_dir, "customer")
        .select(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg2"))
        .distinct()
    )
    return (
        c.join(segs, J.null_safe_eq(c.seg, segs.seg2), "inner")
        .groupBy("seg2")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("seg2").asc_nulls_first())
    )


JOIN_NULLSAFE_ORACLE = """
SELECT seg2, count(*) AS n
FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer) c
JOIN (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg2 FROM customer) s
  ON c.seg IS NOT DISTINCT FROM s.seg2
GROUP BY seg2 ORDER BY seg2 ASC NULLS FIRST
"""


def join_null_skew(spark, sf_dir):
    """Null-key skew split (operators/skew.null_split_left_join): a fact
    table where ~43% of rows carry a NULL join key (lineitem lines 5-7 —
    3 of the 7 uniformly distributed line numbers; measured 0.431,
    simulating events without a user id) left-joined to orders. The
    operator routes the null-key rows around the shuffle entirely (they
    can never match); the oracle is the PLAIN left join — the rewrite
    must be result-invariant."""
    from ..operators.skew import null_split_left_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_linenumber") >= 5, F.lit(None))
        .otherwise(F.col("l_orderkey"))
        .alias("o_orderkey"),
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return (
        null_split_left_join(li, o, ["o_orderkey"])
        .groupBy("l_returnflag", "o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_null_key"),
            F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
            F.round(F.sum("o_totalprice"), 2).alias("order_sum"),
        )
        .orderBy("l_returnflag", F.col("o_orderstatus").asc_nulls_first())
    )


JOIN_NULL_SKEW_ORACLE = """
SELECT l_returnflag, o_orderstatus, count(*) AS n_rows,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key,
       round(sum(l_extendedprice), 2) AS price_sum,
       round(sum(o_totalprice), 2) AS order_sum
FROM (SELECT CASE WHEN l_linenumber >= 5 THEN NULL ELSE l_orderkey END AS k,
             l_quantity, l_extendedprice, l_returnflag
      FROM lineitem) li
LEFT JOIN orders ON li.k = o_orderkey
GROUP BY l_returnflag, o_orderstatus
ORDER BY l_returnflag, o_orderstatus ASC NULLS FIRST
"""


def join_residual(spark, sf_dir):
    """HashJoinExecNode JoinFilter residual (datafusion.proto:1299-1313):
    equi key + non-equi residual predicate evaluated inside the join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        J.join(
            li,
            o,
            li.l_orderkey == o.o_orderkey,
            "inner",
            residual=li.l_extendedprice > o.o_totalprice * 0.5,
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("price_sum"))
        .orderBy("o_orderstatus")
    )


JOIN_RESIDUAL_ORACLE = """
SELECT o_orderstatus, count(*) AS n, round(sum(l_extendedprice), 2) AS price_sum
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey AND l_extendedprice > o_totalprice * 0.5
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# -- set operators (SURVEY.md §2.4 INTERSECT/EXCEPT, §2.5 Distinct, union) ---


def distinct_op(spark, sf_dir):
    """DistinctNode (datafusion.proto:267-269)."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct().orderBy(
        "o_orderstatus", "o_orderpriority"
    )


DISTINCT_ORACLE = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
ORDER BY o_orderstatus, o_orderpriority
"""


def union_all(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return c.union(s).groupBy("nkey").agg(F.count("*").alias("n")).orderBy("nkey")


UNION_ALL_ORACLE = """
SELECT nkey, count(*) AS n FROM (
  SELECT c_nationkey AS nkey FROM customer
  UNION ALL SELECT s_nationkey FROM supplier
) GROUP BY nkey ORDER BY nkey
"""


def union_distinct(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return c.union(s).distinct().orderBy("nkey")


UNION_DISTINCT_ORACLE = """
SELECT c_nationkey AS nkey FROM customer
UNION SELECT s_nationkey FROM supplier ORDER BY nkey
"""


def intersect_op(spark, sf_dir):
    """INTERSECT — lowered to LEFTSEMI by DataFusion (SURVEY.md §2.4)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return J.intersect(c, s).orderBy("nkey")


INTERSECT_ORACLE = """
SELECT c_nationkey AS nkey FROM customer
INTERSECT SELECT s_nationkey FROM supplier ORDER BY nkey
"""


def except_op(spark, sf_dir):
    """EXCEPT — lowered to LEFTANTI by DataFusion (SURVEY.md §2.4).

    Slice: customers who placed orders but never one with status 'F'.
    The previous nation-minus-supplier-nations slice was EMPTY at every
    test scale (all 25 nations have suppliers), so its hash match was
    the vacuous 0=0 green the round-6 verdict flagged for
    dedup_cross_source; this slice is non-empty by measurement at both
    sweep scales (71 rows at sf0.01, 510 at sf0.1)."""
    o = _t(spark, sf_dir, "orders")
    a = o.select(F.col("o_custkey").alias("ckey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("ckey")
    )
    return J.except_(a, b).orderBy("ckey")


EXCEPT_ORACLE = """
SELECT o_custkey AS ckey FROM orders
EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY ckey
"""


def intersect_all_op(spark, sf_dir):
    """INTERSECT ALL — multiset semantics (multiplicity = min of the two
    sides). DataFusion lowers only the DISTINCT form (SURVEY.md §2.4);
    the ALL variant is the standard-SQL completion. Spark plans this as
    a single hash join on (value, replica-id) — no O(N²)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("ckey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("ckey")
    )
    return J.intersect(a, b, all=True).orderBy("ckey")


INTERSECT_ALL_ORACLE = """
SELECT o_custkey AS ckey FROM orders WHERE o_totalprice > 150000
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY ckey
"""


def except_all_op(spark, sf_dir):
    """EXCEPT ALL — multiset difference (multiplicity = left minus right,
    floored at zero). Same standard-SQL completion as INTERSECT ALL."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("ckey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("ckey")
    )
    return J.except_(a, b, all=True).orderBy("ckey")


EXCEPT_ALL_ORACLE = """
SELECT o_custkey AS ckey FROM orders WHERE o_totalprice > 150000
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY ckey
"""


SQL_TPCH_Q1_TEXT = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def sql_tpch_q1(spark, sf_dir):
    """The reference's flagship query (README.md:42-50) through the SQL
    TEXT entry — the reference's primary interface is a SQL string over
    Flight SQL; here the IDENTICAL ANSI text runs on both Spark and the
    DuckDB oracle (dialect-shared, zero translation). Compiles to the
    same partial/final agg plan as the DataFrame form (tpch_q1)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(SQL_TPCH_Q1_TEXT)


def sql_lateral(spark, sf_dir):
    """LATERAL VIEW posexplode through the SQL entry — the row-generating
    table function surface (DataFusion exposes UNNEST; SURVEY.md §2.7's
    GetIndexedField covers element access, this covers expansion).
    Zero-shuffle: scan → generate → sort only for the deterministic
    compare."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, pos, val
        FROM (SELECT l_orderkey, l_linenumber,
                     array(l_quantity, l_discount, l_tax) AS a
              FROM lineitem WHERE l_orderkey < 200) t
        LATERAL VIEW posexplode(a) x AS pos, val
        ORDER BY l_orderkey, l_linenumber, pos
        """
    )


SQL_LATERAL_ORACLE = """
WITH base AS (
  SELECT l_orderkey, l_linenumber, [l_quantity, l_discount, l_tax] AS a
  FROM lineitem WHERE l_orderkey < 200
)
SELECT l_orderkey, l_linenumber,
       CAST(generate_subscripts(a, 1) - 1 AS INT) AS pos,
       unnest(a) AS val
FROM base
ORDER BY l_orderkey, l_linenumber, pos
"""


def sql_pivot(spark, sf_dir):
    """SQL-text PIVOT clause (the SQL-surface twin of the DataFrame
    pivot_op): per-source character totals pivoted on language. Compiles
    to one conditional two-phase aggregate — a pivot is never a shuffle
    per output column."""
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT source,
               coalesce(en, 0) AS en_chars,
               coalesce(de, 0) AS de_chars,
               coalesce(fr, 0) AS fr_chars
        FROM (SELECT source, lang, n_chars FROM documents)
        PIVOT (sum(n_chars) FOR lang IN ('en' en, 'de' de, 'fr' fr))
        ORDER BY source
        """
    )


SQL_PIVOT_ORACLE = """
SELECT source,
       CAST(coalesce(sum(n_chars) FILTER (WHERE lang = 'en'), 0) AS BIGINT) AS en_chars,
       CAST(coalesce(sum(n_chars) FILTER (WHERE lang = 'de'), 0) AS BIGINT) AS de_chars,
       CAST(coalesce(sum(n_chars) FILTER (WHERE lang = 'fr'), 0) AS BIGINT) AS fr_chars
FROM documents GROUP BY source ORDER BY source
"""


def sql_group_by_all(spark, sf_dir):
    """GROUP BY ALL (Spark 4 / modern-ANSI sugar — group on every
    non-aggregate select item): byte-identical text runs on both
    engines, zero translation (the raw-SQL-parity convention of
    sql_tpch_q1)."""
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(SQL_GROUP_BY_ALL_TEXT)


SQL_GROUP_BY_ALL_TEXT = """
SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY ALL ORDER BY lang, source
"""


def sql_qualify(spark, sf_dir):
    """QUALIFY clause (DuckDB / Snowflake / BigQuery window-HAVING
    syntax): top-2 orders per customer by price. Spark lacks native
    QUALIFY, so Engine.sql rewrites it into a subquery +
    ``SELECT * EXCEPT`` filter (engine.py _rewrite_qualify); DuckDB
    runs the IDENTICAL text natively — byte-identical raw-SQL parity,
    the strongest cross-engine contract in the registry. Plan: one
    window over the o_custkey shuffle, filter on the rank — the same
    WindowGroupLimit shape as pipeline_quota."""
    from ..engine import Engine

    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return Engine(spark).sql(SQL_QUALIFY_TEXT)


SQL_QUALIFY_TEXT = """
SELECT o_custkey, o_orderkey, o_totalprice,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
FROM orders
QUALIFY rk <= 2
ORDER BY o_custkey, rk
"""


def agg_salted_skew(spark, sf_dir):
    """Two-stage SALTED aggregation (operators/skew.salted_agg) on the
    most skew-prone key shape there is — 5 event types over the whole
    fact table: stage 1 aggregates on (key, salt-of-row-hash) so the
    hot key's rows spread over 16 partitions, stage 2 merges partials
    on the key alone. The oracle is the PLAIN aggregate: salting must
    be result-invariant, which is exactly the property that makes it a
    legal scale fix (AQE-style skew handling as an explicit, certified
    operator). Integer sum/count/min/max only — exact cross-engine."""
    from ..operators.skew import salted_agg

    e = _t(spark, sf_dir, "events")
    base = e.select("event_type", "user_id", "event_id")
    out = salted_agg(
        base,
        keys=["event_type"],
        aggs={
            "n": ("count", "event_id"),
            "min_user": ("min", "user_id"),
            "max_user": ("max", "user_id"),
            "sum_user": ("sum", "user_id"),
        },
        n_salt=16,
    )
    return out.select(
        "event_type", "n", "min_user", "max_user", "sum_user"
    ).orderBy("event_type")


AGG_SALTED_SKEW_ORACLE = """
SELECT event_type, count(event_id) AS n,
       min(user_id) AS min_user, max(user_id) AS max_user,
       CAST(sum(user_id) AS BIGINT) AS sum_user
FROM events GROUP BY event_type ORDER BY event_type
"""


def join_salted_skew(spark, sf_dir):
    """SALTED inner equi-join (operators/skew.salted_join) of the events
    fact table against the 5-row event-type dimension — the canonical
    hot-key join (a 5-key build side means every probe row hits one of
    5 hash partitions unsalted). The probe side gets a 16-way
    deterministic row-hash salt, the build side is exploded 16×, and
    the join keys on (type, salt). The oracle is the PLAIN join + agg:
    salting must not change a single row. Output: per-type joined
    rollup proving row multiplicity survived exactly."""
    from ..operators.skew import salted_join

    e = _t(spark, sf_dir, "events")
    dim = (
        e.select(F.col("event_type").alias("t")).distinct()
        .withColumn("type_tag", F.concat(F.lit("tag:"), F.col("t")))
    )
    joined = salted_join(
        e.select("event_type", "event_id", "value"),
        dim,
        "event_type",
        "t",
        n_salt=16,
    )
    return (
        joined.groupBy("event_type", "type_tag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_v"),
        )
        .orderBy("event_type")
    )


JOIN_SALTED_SKEW_ORACLE = """
WITH dim AS (
  SELECT DISTINCT event_type AS t, 'tag:' || event_type AS type_tag
  FROM events)
SELECT e.event_type, d.type_tag, count(*) AS n,
       round(sum(e.value), 4) AS sum_v
FROM events e JOIN dim d ON e.event_type = d.t
GROUP BY 1, 2 ORDER BY e.event_type
"""


def sql_distinct_on(spark, sf_dir):
    """DISTINCT ON (PostgreSQL / DuckDB first-row-per-group syntax):
    each customer's LATEST order. Spark lacks the clause, so Engine.sql
    rewrites it into a row_number window + filter
    (engine.py _rewrite_distinct_on); DuckDB executes the IDENTICAL
    text natively — byte-identical raw-SQL parity, the sql_qualify
    contract. Plan: one window over the o_custkey shuffle with
    WindowGroupLimit pruning to 1 row per key."""
    from ..engine import Engine

    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return Engine(spark).sql(SQL_DISTINCT_ON_TEXT)


SQL_DISTINCT_ON_TEXT = """
SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey,
       CAST(o_orderdate AS VARCHAR(10)) AS od, o_totalprice
FROM orders
WHERE o_custkey < 200
ORDER BY o_custkey, od DESC, o_orderkey
"""


def values_inline(spark, sf_dir):
    """ValuesNode (datafusion.proto:212-217) + EmptyRelation `SELECT 1`
    (datafusion.proto:167-169) via a no-FROM select unioned in."""
    return spark.sql(
        "SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, NULL) AS t(id, tag) "
        "UNION ALL SELECT 4 AS id, 'd' AS tag ORDER BY id"
    )


VALUES_ORACLE = """
SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, NULL)) t(id, tag)
UNION ALL SELECT 4, 'd' ORDER BY id
"""


def sql_subquery_exists_in(spark, sf_dir):
    """Correlated EXISTS + NOT IN subqueries through the SQL entry —
    DataFusion's SubqueryAliasNode + decorrelation surface
    (datafusion.proto:292-296). Catalyst decorrelates both to semi/anti
    hash joins (never a per-row re-execution), so the shape scales the
    same as the explicit-join form."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(SQL_SUBQUERY_EXISTS_IN)


SQL_SUBQUERY_EXISTS_IN = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
  AND c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
ORDER BY c_custkey
"""


def sql_subquery_scalar(spark, sf_dir):
    """Scalar subqueries through the SQL entry: an uncorrelated scalar in
    the WHERE (max/2 — exact, no float-accumulation straddle) and a
    correlated scalar count in the SELECT list. Catalyst turns the former
    into a broadcast literal, the latter into an outer join + agg."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey,
               CAST((SELECT count(*) FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_totalprice > (SELECT max(o_totalprice) / 2 FROM orders))
                    AS BIGINT) AS n_big_orders
        FROM customer c
        WHERE c_custkey <= 300
        ORDER BY c_custkey
        """
    )


SQL_SUBQUERY_SCALAR_ORACLE = """
SELECT c_custkey,
       CAST((SELECT count(*) FROM orders o
             WHERE o.o_custkey = c.c_custkey
               AND o.o_totalprice > (SELECT max(o_totalprice) / 2 FROM orders))
            AS BIGINT) AS n_big_orders
FROM customer c
WHERE c_custkey <= 300
ORDER BY c_custkey
"""


# -- aggregation (SURVEY.md §2.5) --------------------------------------------


def agg_basic(spark, sf_dir):
    """Two-phase hash agg (AggregateExecNode PARTIAL/FINAL_PARTITIONED,
    datafusion.proto:1225-1249 — automatic in Spark): MIN MAX SUM AVG COUNT
    + COUNT(*) over a group."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("min_q"),
            F.max("l_quantity").alias("max_q"),
            F.sum("l_quantity").alias("sum_q"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_p"),
            F.count("l_partkey").alias("cnt"),
            F.count("*").alias("cnt_all"),
            F.min("l_shipdate").alias("min_d"),
            F.max("l_shipdate").alias("max_d"),
        )
        .orderBy("l_returnflag")
    )


AGG_BASIC_ORACLE = """
SELECT l_returnflag, min(l_quantity) AS min_q, max(l_quantity) AS max_q,
       sum(l_quantity) AS sum_q, round(avg(l_extendedprice), 6) AS avg_p,
       count(l_partkey) AS cnt, count(*) AS cnt_all,
       min(l_shipdate) AS min_d, max(l_shipdate) AS max_d
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_stats(spark, sf_dir):
    """Statistical aggregates (datafusion.proto:529-549): VARIANCE,
    VARIANCE_POP, STDDEV, STDDEV_POP, COVARIANCE, COVARIANCE_POP,
    CORRELATION. Rounded — accumulation-order-sensitive."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.var_samp("l_quantity"), 4).alias("var_s"),
            F.round(F.var_pop("l_quantity"), 4).alias("var_p"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("std_s"),
            F.round(F.stddev_pop("l_quantity"), 4).alias("std_p"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_s"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("cov_p"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        )
        .orderBy("l_linestatus")
    )


AGG_STATS_ORACLE = """
SELECT l_linestatus,
       round(var_samp(l_quantity), 4) AS var_s, round(var_pop(l_quantity), 4) AS var_p,
       round(stddev_samp(l_quantity), 4) AS std_s, round(stddev_pop(l_quantity), 4) AS std_p,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_s,
       round(covar_pop(l_quantity, l_extendedprice), 2) AS cov_p,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""


def agg_distinct_filter(spark, sf_dir):
    """DISTINCT + FILTER aggregate modifiers (datafusion.proto:551-556) —
    written in SQL to exercise Spark's FILTER (WHERE ...) clause."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS nd_part,
               count(DISTINCT l_suppkey) AS nd_supp,
               sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_hi_disc,
               count(*) FILTER (WHERE l_tax = 0) AS n_no_tax
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


AGG_DISTINCT_FILTER_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS nd_part,
       count(DISTINCT l_suppkey) AS nd_supp,
       sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_hi_disc,
       count(*) FILTER (WHERE l_tax = 0) AS n_no_tax
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_median(spark, sf_dir):
    """MEDIAN (datafusion.proto:548) — exact median, plus min/max guard."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_quantity"), 6).alias("med_q"),
            F.round(F.median("l_extendedprice"), 6).alias("med_p"),
        )
        .orderBy("l_returnflag")
    )


AGG_MEDIAN_ORACLE = """
SELECT l_returnflag, round(median(l_quantity), 6) AS med_q,
       round(median(l_extendedprice), 6) AS med_p
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_mode(spark, sf_dir):
    """Deterministic MODE: most frequent value per group, smallest value
    winning ties (Spark's and DuckDB's native mode() are both
    arbitrary-on-ties, so the deterministic contract is built as
    count-then-rank — one extra shuffle over the grouped counts, which
    are tiny by construction)."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("_n"))
    w = W.partitionBy("l_returnflag").orderBy(F.col("_n").desc(), F.col("l_quantity"))
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "l_returnflag",
            F.round("l_quantity", 2).alias("mode_q"),
            F.col("_n").alias("mode_n"),
        )
        .orderBy("l_returnflag")
    )


AGG_MODE_ORACLE = """
WITH c AS (
  SELECT l_returnflag, l_quantity, count(*) AS _n
  FROM lineitem GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY l_returnflag
                               ORDER BY _n DESC, l_quantity) AS _r
  FROM c)
SELECT l_returnflag, round(l_quantity, 2) AS mode_q, _n AS mode_n
FROM r WHERE _r = 1 ORDER BY l_returnflag
"""


def agg_array_agg(spark, sf_dir):
    """ARRAY_AGG (datafusion.proto:536) — order-canonicalized to a joined
    string since collect order is partition-dependent by design."""
    n = _t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names"))
        .orderBy("n_regionkey")
    )


AGG_ARRAY_AGG_ORACLE = """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


def agg_approx(spark, sf_dir):
    """APPROX_DISTINCT / APPROX_PERCENTILE_CONT / APPROX_MEDIAN
    (datafusion.proto:535, 545-546). Sketch outputs differ per
    implementation (HLL++ vs DataFusion's), so no value oracle — the
    driver's rows-only check applies; exact-agg analogues are certified in
    agg_basic/agg_median."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("apx_nd"),
            F.percentile_approx("l_quantity", 0.5).alias("apx_med"),
            F.percentile_approx("l_extendedprice", 0.95).alias("apx_p95"),
        )
        .orderBy("l_returnflag")
    )


def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS + GROUPING flag (datafusion.proto:370-380, :547)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_st,
               CAST(grouping(o_orderpriority) AS INT) AS g_pr,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority), ())
        ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


AGG_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_st,
       CAST(grouping(o_orderpriority) AS INT) AS g_pr,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority), ())
ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def agg_cube(spark, sf_dir):
    """CUBE (datafusion.proto:374) via df.cube()."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


AGG_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def agg_rollup(spark, sf_dir):
    """ROLLUP (datafusion.proto:378) via df.rollup()."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


AGG_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def agg_weighted_percentile(spark, sf_dir):
    """APPROX_PERCENTILE_CONT_WITH_WEIGHT (datafusion.proto:546) — Spark
    has no weighted percentile; exact cumulative-weight shim
    (operators/aggregates.weighted_percentile), oracle-checked with the
    same lower-bound definition."""
    from ..operators.aggregates import weighted_percentile

    li = _t(spark, sf_dir, "lineitem")
    return weighted_percentile(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", 0.5, "wp50"
    ).orderBy("l_returnflag")


AGG_WEIGHTED_PCT_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         sum(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_quantity
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem)
SELECT l_returnflag, min(l_extendedprice) AS wp50
FROM ranked WHERE cw >= 0.5 * tw
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def pivot_op(spark, sf_dir):
    """Pivot (free extension; no reference node): quantity totals per
    returnflag pivoted on linestatus."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_f"),
            F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_o"),
        )
        .orderBy("l_returnflag")
    )


PIVOT_ORACLE = """
SELECT l_returnflag,
       coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0.0) AS qty_f,
       coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0.0) AS qty_o
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def unpivot_op(spark, sf_dir):
    """Unpivot/stack (free extension): wide per-flag metrics to long form."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
        F.sum("l_quantity").alias("qty"),
    )
    return (
        wide.unpivot("l_returnflag", ["price", "qty"], "metric", "val")
        .orderBy("l_returnflag", "metric")
    )


UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT l_returnflag, round(sum(l_extendedprice), 2) AS price, sum(l_quantity) AS qty
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, 'price' AS metric, price AS val FROM wide
UNION ALL
SELECT l_returnflag, 'qty', qty FROM wide
ORDER BY l_returnflag, metric
"""


def agg_quantiles(spark, sf_dir):
    """One-pass multi-quantile: EXACT percentile over an array of
    probabilities — one aggregation buffer per group computes p25/p50/p75
    together (vs three separate sorts). DuckDB's quantile_cont takes the
    same list. The internal accumulator is the array form; the OUTPUT
    unpacks it to three scalar double columns (p25/p50/p75) because the
    certification harness canonicalizes rows via pandas, which cannot
    sort/hash array cells. Rounded: the linear interpolation arithmetic
    differs in last-ulp between engines."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))").alias("_q"),
            F.count("*").alias("n"),
        )
        .select(
            "o_orderstatus",
            F.round(F.element_at("_q", 1), 4).alias("p25"),
            F.round(F.element_at("_q", 2), 4).alias("p50"),
            F.round(F.element_at("_q", 3), 4).alias("p75"),
            "n",
        )
        .orderBy("o_orderstatus")
    )


AGG_QUANTILES_ORACLE = """
WITH q AS (
  SELECT o_orderstatus,
         quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS qs,
         count(*) AS n
  FROM orders GROUP BY o_orderstatus)
SELECT o_orderstatus,
       round(qs[1], 4) AS p25,
       round(qs[2], 4) AS p50,
       round(qs[3], 4) AS p75,
       n
FROM q ORDER BY o_orderstatus
"""


def agg_regression(spark, sf_dir):
    """Linear-regression aggregates (DataFusion/Spark both ship the
    regr_* family): hourly event-count trend per event type —
    slope/intercept/R² of n over hours-since-epoch, computed in the same
    single two-phase agg pass as any other aggregate (the moment sums
    are map-side combinable). Rounded: moment accumulation is
    order-sensitive in the last ulps."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600)).alias("h"),
    ).agg(F.count("*").alias("n"))
    return (
        hourly.groupBy("event_type")
        .agg(
            F.round(F.regr_slope("n", "h"), 6).alias("slope"),
            F.round(F.regr_intercept("n", "h") / 1000, 4).alias("intercept_k"),
            F.round(F.regr_r2("n", "h"), 6).alias("r2"),
            F.regr_count("n", "h").alias("n_hours"),
        )
        .orderBy("event_type")
    )


AGG_REGRESSION_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT) AS h,
         count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type,
       round(regr_slope(n, h), 6) AS slope,
       round(regr_intercept(n, h) / 1000, 4) AS intercept_k,
       round(regr_r2(n, h), 6) AS r2,
       CAST(regr_count(n, h) AS BIGINT) AS n_hours
FROM hourly GROUP BY event_type ORDER BY event_type
"""


def agg_boolean(spark, sf_dir):
    """Boolean aggregates BOOL_AND/BOOL_OR (DataFusion ships both):
    per-type data-quality flags over events — map-side combinable
    single-bit state, the cheapest possible aggregate at scale."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("value") > 99).alias("any_gt99"),
            F.bool_and(F.col("user_id") < 1000).alias("all_small_uid"),
        )
        .orderBy("event_type")
    )


AGG_BOOLEAN_ORACLE = """
SELECT event_type,
       bool_and(value >= 0) AS all_nonneg,
       bool_or(value > 99) AS any_gt99,
       bool_and(user_id < 1000) AS all_small_uid
FROM events GROUP BY event_type ORDER BY event_type
"""


def agg_minmax_by(spark, sf_dir):
    """MIN_BY / MAX_BY argmin-argmax aggregates (modern-ANSI surface,
    identical names in DuckDB): per market segment, the customer name at
    the lowest/highest custkey and the order TOTAL PRICE of that
    segment's first/last order by orderkey (argmin/argmax returns the
    VALUE column, picked at the extreme KEY). Comparison keys are UNIQUE (custkey,
    orderkey), so the pick is deterministic on both engines — min_by on
    a tied key is engine-defined and would not certify."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    co = c.join(o, c.c_custkey == o.o_custkey, "inner")
    return (
        co.groupBy("c_mktsegment")
        .agg(
            F.min_by("c_name", "c_custkey").alias("first_cust"),
            F.max_by("c_name", "c_custkey").alias("last_cust"),
            F.min_by("o_totalprice", "o_orderkey").alias("first_order_price"),
            F.max_by("o_totalprice", "o_orderkey").alias("last_order_price"),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


AGG_MINMAX_BY_ORACLE = """
SELECT c_mktsegment,
       min_by(c_name, c_custkey) AS first_cust,
       max_by(c_name, c_custkey) AS last_cust,
       min_by(o_totalprice, o_orderkey) AS first_order_price,
       max_by(o_totalprice, o_orderkey) AS last_order_price,
       count(*) AS n
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def agg_string(spark, sf_dir):
    """Ordered string aggregation (DuckDB string_agg ORDER BY ≅ Spark
    concat_ws over sort_array(collect_list)): comma-joined region names
    per... region is 5 rows — use nations per region, the classic
    reporting rollup. Deterministic via explicit sort of the collected
    array (never rely on collect_list order, which is partition-order-
    dependent)."""
    n = _t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )


AGG_STRING_ORACLE = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


def sql_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (ANSI recursive CTE, supported by Spark 4.1's SQL
    entry) — iterative expansion INSIDE the declarative plan, the SQL
    counterpart of the connected-components loop. Synthetic hierarchy
    over nation: parent(n) = n div 2; each row walks its ancestor chain
    to the root and reports depth and chain length. DuckDB runs the
    identical recursion (integer-division spelled `//` there, `div`
    here). Depth is log2(25) ≈ 5 — the recursion is bounded and the
    per-iteration frame is 25 rows; at scale Spark executes each step as
    a distributed union-all batch, state bounded by the frontier."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        WITH RECURSIVE anc(node, cur, depth) AS (
          SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
                 CAST(0 AS BIGINT)
          FROM nation
          UNION ALL
          SELECT node, cur div 2, depth + CAST(1 AS BIGINT)
          FROM anc WHERE cur > 0
        )
        SELECT node, max(depth) AS depth_to_root, count(*) AS chain_len
        FROM anc GROUP BY node ORDER BY node
        """
    )


SQL_RECURSIVE_CTE_ORACLE = """
WITH RECURSIVE anc(node, cur, depth) AS (
  SELECT n_nationkey, n_nationkey, CAST(0 AS BIGINT) FROM nation
  UNION ALL
  SELECT node, cur // 2, depth + 1 FROM anc WHERE cur > 0
)
SELECT node, CAST(max(depth) AS BIGINT) AS depth_to_root,
       count(*) AS chain_len
FROM anc GROUP BY node ORDER BY node
"""


def market_basket(spark, sf_dir):
    """Market-basket co-occurrence: the 15 part pairs most often ordered
    together, among the 50 most-ordered parts. The self-join bound is
    the design: the (order, part) incidence table is first DISTINCT'd
    and filtered to the top-50 parts (a broadcast of 50 keys), so the
    orderkey-keyed self-join expands at most C(50,2) pair groups per
    order — never the unbounded all-pairs blowup. One orderkey shuffle
    + one pair-keyed count; top-15 compiles to TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    top = (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("_n"))
        .orderBy(F.desc("_n"), "l_partkey")
        .limit(50)
        .select("l_partkey")
    )
    inc = li.join(F.broadcast(top), "l_partkey")
    a = inc.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = inc.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(15)
    )


MARKET_BASKET_ORACLE = """
WITH inc0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
top AS (
  SELECT l_partkey FROM inc0 GROUP BY l_partkey
  ORDER BY count(*) DESC, l_partkey LIMIT 50),
inc AS (SELECT i.* FROM inc0 i JOIN top USING (l_partkey))
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders
FROM inc a JOIN inc b ON a.l_orderkey = b.l_orderkey
WHERE a.l_partkey < b.l_partkey
GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b LIMIT 15
"""


def customer_rfm(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary), the canonical
    customer-analytics rollup: per-customer order stats → ntile(4)
    quartile codes (custkey tiebreak pins ties identically on both
    engines) → segment population counts. Plan shape: one customer-grain
    agg shuffle, then THREE single-partition window sorts (each ntile
    orders by a different key — recency/frequency/monetary — so they
    cannot share a sort); output is the ≤64-row segment histogram. The
    global sorts run on POST-AGGREGATION rows (one per customer), which
    is what bounds them — at 10⁹+ customers swap exact ntile for
    percentile-threshold bucketing (3 one-row quantile aggs broadcast
    back), trading exact quartile populations for distributed binning."""
    o = _t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("_last"),
        F.count("*").alias("_freq"),
        F.round(F.sum("o_totalprice"), 2).alias("_spend"),
    )
    r = F.ntile(4).over(W.orderBy(F.desc("_last"), "o_custkey"))
    f = F.ntile(4).over(W.orderBy(F.desc("_freq"), "o_custkey"))
    m = F.ntile(4).over(W.orderBy(F.desc("_spend"), "o_custkey"))
    seg = per.select(
        r.alias("r_quartile"), f.alias("f_quartile"), m.alias("m_quartile")
    )
    return (
        seg.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


CUSTOMER_RFM_ORACLE = """
WITH per AS (
  SELECT o_custkey, max(o_orderdate) AS last_d, count(*) AS freq,
         round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY o_custkey),
q AS (
  SELECT ntile(4) OVER (ORDER BY last_d DESC, o_custkey) AS r_quartile,
         ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS f_quartile,
         ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS m_quartile
  FROM per)
SELECT r_quartile, f_quartile, m_quartile, count(*) AS n_customers
FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def market_supplier_scorecard(spark, sf_dir):
    """Supplier scorecard, top-3 per nation by revenue: net revenue,
    shipped-line count, return rate (share of 'R' returnflag lines),
    and average discount per supplier, ranked within the supplier's
    nation — the composite BI rollup (fact agg → dim join → windowed
    top-k per group) that exercises the whole relational stack in one
    realistic query. One lineitem aggregate (map-side combined, the
    only fact-scale shuffle), broadcast dim joins, a rank window over
    the supplier-grain table (WindowGroupLimit prunes to 3 per nation),
    ordered by rounded revenue with suppkey tiebreak (the house
    determinism trick)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    per = l.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("return_rate"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
    )
    joined = per.join(
        s.select("s_suppkey", "s_name", "s_nationkey"),
        per["l_suppkey"] == s["s_suppkey"],
    ).join(F.broadcast(n.select("n_nationkey", "n_name")),
           F.col("s_nationkey") == F.col("n_nationkey"))
    w = W.partitionBy("n_name").orderBy(F.col("revenue").desc(), "s_suppkey")
    return (
        joined.withColumn("nation_rank", F.rank().over(w))
        .filter(F.col("nation_rank") <= 3)
        .select(
            F.col("n_name").alias("nation"),
            "nation_rank",
            "s_name",
            "revenue",
            "n_lines",
            "return_rate",
            "avg_discount",
        )
        .orderBy("nation", "nation_rank", "s_name")
    )


MARKET_SUPPLIER_SCORECARD_ORACLE = """
WITH per AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_lines,
         round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.0
               / count(*), 6) AS return_rate,
         round(avg(l_discount), 6) AS avg_discount
  FROM lineitem GROUP BY l_suppkey),
joined AS (
  SELECT n.n_name AS nation, s.s_name, s.s_suppkey, per.revenue,
         per.n_lines, per.return_rate, per.avg_discount,
         rank() OVER (PARTITION BY n.n_name
                      ORDER BY per.revenue DESC, s.s_suppkey) AS nation_rank
  FROM per
  JOIN supplier s ON per.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey)
SELECT nation, nation_rank, s_name, revenue, n_lines, return_rate,
       avg_discount
FROM joined WHERE nation_rank <= 3
ORDER BY nation, nation_rank, s_name
"""


def customer_churn(spark, sf_dir):
    """Churn rollup per market segment: a customer is CHURNED when
    their last order predates the corpus's final order date by more
    than a year — the retention KPI every subscription/commerce
    analytics stack computes, expressed scale-correctly: one per-
    customer max-date aggregate (fact-scale, map-side combined), the
    1-row global max broadcast back, a broadcast customer-dim join,
    one segment-level reduce. Churned customers' lifetime spend is
    reported beside the rate to show what the churn is worth."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("_last"),
        F.sum("o_totalprice").alias("_spend"),
    )
    mx = o.agg(F.max("o_orderdate").alias("_mx"))
    flagged = per.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        "_spend",
        # expr interval keeps any time-of-day on the max order date
        # (date_sub truncates to midnight — the oracle subtracts
        # INTERVAL 365 DAY, time-preserving)
        (F.col("_last") < F.col("_mx") - F.expr("INTERVAL 365 DAYS"))
        .cast("int")
        .alias("churned"),
    )
    return (
        flagged.join(
            c.select("c_custkey", "c_mktsegment"),
            flagged["o_custkey"] == c["c_custkey"],
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("churned").alias("n_churned"),
            F.round(F.sum("churned") / F.count("*"), 6).alias("churn_rate"),
            F.round(
                F.sum(F.when(F.col("churned") == 1, F.col("_spend"))), 2
            ).alias("churned_spend"),
        )
        .orderBy("c_mktsegment")
    )


CUSTOMER_CHURN_ORACLE = """
WITH per AS (
  SELECT o_custkey, max(o_orderdate) AS last_d, sum(o_totalprice) AS spend
  FROM orders GROUP BY o_custkey),
mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
flagged AS (
  SELECT o_custkey, spend,
         CASE WHEN last_d < mxd - INTERVAL 365 DAY THEN 1 ELSE 0 END AS churned
  FROM per, mx)
SELECT c.c_mktsegment, count(*) AS n_customers,
       CAST(sum(f.churned) AS BIGINT) AS n_churned,
       round(sum(f.churned) * 1.0 / count(*), 6) AS churn_rate,
       round(sum(CASE WHEN f.churned = 1 THEN f.spend END), 2) AS churned_spend
FROM flagged f JOIN customer c ON f.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""


QUERIES = {
    "market_basket": market_basket,
    "customer_rfm": customer_rfm,
    "market_supplier_scorecard": market_supplier_scorecard,
    "customer_churn": customer_churn,
    "sql_distinct_on": sql_distinct_on,
    "agg_salted_skew": agg_salted_skew,
    "join_salted_skew": join_salted_skew,
    "agg_quantiles": agg_quantiles,
    "agg_regression": agg_regression,
    "agg_boolean": agg_boolean,
    "agg_string": agg_string,
    "agg_minmax_by": agg_minmax_by,
    "projection": projection,
    "agg_weighted_percentile": agg_weighted_percentile,
    "pivot_op": pivot_op,
    "unpivot_op": unpivot_op,
    "filter_pred": filter_pred,
    "limit_offset": limit_offset,
    "sort_topk": sort_topk,
    "sort_nulls": sort_nulls,
    "join_inner": join_inner,
    "join_left": join_left,
    "join_right": join_right,
    "join_full": join_full,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_right_semi": join_right_semi,
    "join_right_anti": join_right_anti,
    "join_cross": join_cross,
    "join_nullsafe": join_nullsafe,
    "join_null_skew": join_null_skew,
    "join_residual": join_residual,
    "distinct_op": distinct_op,
    "union_all": union_all,
    "union_distinct": union_distinct,
    "intersect_op": intersect_op,
    "except_op": except_op,
    "intersect_all_op": intersect_all_op,
    "except_all_op": except_all_op,
    "values_inline": values_inline,
    "sql_tpch_q1": sql_tpch_q1,
    "sql_lateral": sql_lateral,
    "sql_pivot": sql_pivot,
    "sql_group_by_all": sql_group_by_all,
    "sql_qualify": sql_qualify,
    "sql_subquery_exists_in": sql_subquery_exists_in,
    "sql_subquery_scalar": sql_subquery_scalar,
    "sql_recursive_cte": sql_recursive_cte,
    "agg_basic": agg_basic,
    "agg_stats": agg_stats,
    "agg_distinct_filter": agg_distinct_filter,
    "agg_median": agg_median,
    "agg_mode": agg_mode,
    "agg_array_agg": agg_array_agg,
    "agg_approx": agg_approx,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_cube": agg_cube,
    "agg_rollup": agg_rollup,
}

ORACLES = {
    "market_basket": MARKET_BASKET_ORACLE,
    "customer_rfm": CUSTOMER_RFM_ORACLE,
    "market_supplier_scorecard": MARKET_SUPPLIER_SCORECARD_ORACLE,
    "customer_churn": CUSTOMER_CHURN_ORACLE,
    "sql_distinct_on": SQL_DISTINCT_ON_TEXT,
    "agg_salted_skew": AGG_SALTED_SKEW_ORACLE,
    "join_salted_skew": JOIN_SALTED_SKEW_ORACLE,
    "agg_quantiles": AGG_QUANTILES_ORACLE,
    "agg_regression": AGG_REGRESSION_ORACLE,
    "agg_boolean": AGG_BOOLEAN_ORACLE,
    "agg_string": AGG_STRING_ORACLE,
    "agg_minmax_by": AGG_MINMAX_BY_ORACLE,
    "projection": PROJECTION_ORACLE,
    "agg_weighted_percentile": AGG_WEIGHTED_PCT_ORACLE,
    "pivot_op": PIVOT_ORACLE,
    "unpivot_op": UNPIVOT_ORACLE,
    "filter_pred": FILTER_ORACLE,
    "limit_offset": LIMIT_OFFSET_ORACLE,
    "sort_topk": SORT_TOPK_ORACLE,
    "sort_nulls": SORT_NULLS_ORACLE,
    "join_inner": JOIN_INNER_ORACLE,
    "join_left": JOIN_LEFT_ORACLE,
    "join_right": JOIN_RIGHT_ORACLE,
    "join_full": JOIN_FULL_ORACLE,
    "join_semi": JOIN_SEMI_ORACLE,
    "join_anti": JOIN_ANTI_ORACLE,
    "join_right_semi": JOIN_SEMI_ORACLE,  # RIGHTSEMI ≡ swapped LEFTSEMI
    "join_right_anti": JOIN_ANTI_ORACLE,  # RIGHTANTI ≡ swapped LEFTANTI
    "join_cross": JOIN_CROSS_ORACLE,
    "join_nullsafe": JOIN_NULLSAFE_ORACLE,
    "join_null_skew": JOIN_NULL_SKEW_ORACLE,
    "join_residual": JOIN_RESIDUAL_ORACLE,
    "distinct_op": DISTINCT_ORACLE,
    "union_all": UNION_ALL_ORACLE,
    "union_distinct": UNION_DISTINCT_ORACLE,
    "intersect_op": INTERSECT_ORACLE,
    "except_op": EXCEPT_ORACLE,
    "intersect_all_op": INTERSECT_ALL_ORACLE,
    "except_all_op": EXCEPT_ALL_ORACLE,
    "values_inline": VALUES_ORACLE,
    "sql_tpch_q1": SQL_TPCH_Q1_TEXT,
    "sql_lateral": SQL_LATERAL_ORACLE,
    "sql_pivot": SQL_PIVOT_ORACLE,
    "sql_group_by_all": SQL_GROUP_BY_ALL_TEXT,
    "sql_qualify": SQL_QUALIFY_TEXT,
    "sql_subquery_exists_in": SQL_SUBQUERY_EXISTS_IN,
    "sql_subquery_scalar": SQL_SUBQUERY_SCALAR_ORACLE,
    "sql_recursive_cte": SQL_RECURSIVE_CTE_ORACLE,
    "agg_basic": AGG_BASIC_ORACLE,
    "agg_stats": AGG_STATS_ORACLE,
    "agg_distinct_filter": AGG_DISTINCT_FILTER_ORACLE,
    "agg_median": AGG_MEDIAN_ORACLE,
    "agg_mode": AGG_MODE_ORACLE,
    "agg_array_agg": AGG_ARRAY_AGG_ORACLE,
    "agg_grouping_sets": AGG_GROUPING_SETS_ORACLE,
    "agg_cube": AGG_CUBE_ORACLE,
    "agg_rollup": AGG_ROLLUP_ORACLE,
}
