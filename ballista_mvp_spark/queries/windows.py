"""Window-function certification — SURVEY.md §2.6.

The reference declares 11 built-in window functions plus aggregates-over-
frames (reference: ballista/core/proto/datafusion.proto:569-594) with
ROWS/RANGE frame specs (:651-676) — but cannot execute them distributed
(scheduler/src/planner.rs:138-141 raises NotImplemented). Spark runs them
distributed natively, so this module certifies the declared surface and
deliberately exceeds the reference's execution gap. GROUPS frames have no
native Spark (or DuckDB) equivalent; window_agg_groups_frame emulates
them exactly via a RANGE frame over dense_rank (peer rows share a rank,
so rank distance counts peer groups), certified against an independent
group-total + lag/lead oracle formulation.

Determinism rules: ROW_NUMBER/NTILE/LAG/LEAD/NTH_VALUE are only well-
defined over a total order → every orderBy carries a unique tiebreaker.
RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST depend only on key values → ties
are fine and exercised on purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def window_row_number(spark, sf_dir):
    """ROW_NUMBER (datafusion.proto:571) — top-5 orders per priority.
    The canonical scale pattern: partial per-partition topk via window,
    never a global sort."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    )


WINDOW_ROW_NUMBER_ORACLE = """
SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 5
ORDER BY o_orderpriority, rn
"""


def window_rank_ties(spark, sf_dir):
    """RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST (datafusion.proto:
    572-575) over a deliberately tie-heavy key."""
    s = _t(spark, sf_dir, "supplier")
    band = F.floor(F.col("s_acctbal") / 1000).alias("band")
    w = W.partitionBy("s_nationkey").orderBy(F.floor(F.col("s_acctbal") / 1000))
    return s.select(
        "s_suppkey",
        "s_nationkey",
        band,
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prnk"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
    ).orderBy("s_suppkey")


WINDOW_RANK_TIES_ORACLE = """
SELECT s_suppkey, s_nationkey, CAST(floor(s_acctbal / 1000) AS BIGINT) AS band,
       rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
       round(percent_rank() OVER w, 9) AS prnk,
       round(cume_dist() OVER w, 9) AS cdist
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY floor(s_acctbal / 1000))
ORDER BY s_suppkey
"""


def window_ntile(spark, sf_dir):
    """NTILE (datafusion.proto:576) — quartiles over a total order."""
    c = _t(spark, sf_dir, "customer")
    w = W.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select("c_custkey", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(F.count("*").alias("n"), F.min("c_custkey").alias("min_key"))
        .orderBy("quartile")
    )


WINDOW_NTILE_ORACLE = """
SELECT quartile, count(*) AS n, min(c_custkey) AS min_key FROM (
  SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
  FROM customer) GROUP BY quartile ORDER BY quartile
"""


def window_lag_lead(spark, sf_dir):
    """LAG / LEAD (datafusion.proto:577-578) with offsets and defaults."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_id", 1).over(w).alias("prev_id"),
        F.lag("event_id", 2, -1).over(w).alias("prev2_id"),
        F.lead("event_id", 1, -1).over(w).alias("next_id"),
        F.round(F.col("value") - F.lag("value", 1, 0.0).over(w), 6).alias("dv"),
    ).orderBy("user_id", "event_id")


WINDOW_LAG_LEAD_ORACLE = """
SELECT user_id, event_id,
       lag(event_id, 1) OVER w AS prev_id,
       lag(event_id, 2, -1) OVER w AS prev2_id,
       lead(event_id, 1, -1) OVER w AS next_id,
       round(value - lag(value, 1, 0.0) OVER w, 6) AS dv
FROM events WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


def window_first_last_nth(spark, sf_dir):
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE (datafusion.proto:579-581)
    over an explicit unbounded ROWS frame (LAST_VALUE under the default
    frame is a well-known footgun — pin the frame)."""
    s = _t(spark, sf_dir, "supplier")
    w = (
        W.partitionBy("s_nationkey")
        .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.first("s_name").over(w).alias("richest"),
        F.last("s_name").over(w).alias("poorest"),
        F.nth_value("s_name", 2).over(w).alias("second"),
    ).orderBy("s_suppkey")


WINDOW_FIRST_LAST_NTH_ORACLE = """
SELECT s_suppkey, s_nationkey,
       first_value(s_name) OVER w AS richest,
       last_value(s_name) OVER w AS poorest,
       nth_value(s_name, 2) OVER w AS second
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY s_suppkey
"""


def window_agg_rows_frame(spark, sf_dir):
    """Aggregates over a sliding ROWS frame (datafusion.proto:583-594,
    frame units :651-676): moving sum/avg/min/count."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 1)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("mov_sum"),
        F.round(F.avg("value").over(w), 6).alias("mov_avg"),
        F.round(F.min("value").over(w), 6).alias("mov_min"),
        F.count("*").over(w).alias("mov_n"),
    ).orderBy("user_id", "event_id")


WINDOW_AGG_ROWS_ORACLE = """
SELECT user_id, event_id,
       round(sum(value) OVER w, 6) AS mov_sum,
       round(avg(value) OVER w, 6) AS mov_avg,
       round(min(value) OVER w, 6) AS mov_min,
       count(*) OVER w AS mov_n
FROM events WHERE user_id < 30
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
ORDER BY user_id, event_id
"""


def window_agg_range_frame(spark, sf_dir):
    """RANGE frame with numeric offsets (datafusion.proto:664-676):
    peers-by-value semantics — deterministic under ties by construction."""
    s = _t(spark, sf_dir, "supplier")
    band = F.floor(F.col("s_acctbal") / 100)
    w = W.partitionBy("s_nationkey").orderBy(band).rangeBetween(-5, 0)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        band.cast("long").alias("band"),
        F.count("*").over(w).alias("n_near"),
        F.round(F.sum("s_acctbal").over(w), 4).alias("bal_near"),
    ).orderBy("s_suppkey")


WINDOW_AGG_RANGE_ORACLE = """
SELECT s_suppkey, s_nationkey, CAST(floor(s_acctbal / 100) AS BIGINT) AS band,
       count(*) OVER w AS n_near,
       round(sum(s_acctbal) OVER w, 4) AS bal_near
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY floor(s_acctbal / 100)
             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
ORDER BY s_suppkey
"""


def window_running_total(spark, sf_dir):
    """Cumulative aggregate (UNBOUNDED PRECEDING → CURRENT ROW) — running
    revenue per customer over order history."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_total"),
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("order_seq"),
    ).orderBy("o_custkey", "order_seq")


WINDOW_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS running_total,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders WHERE o_custkey < 100
ORDER BY o_custkey, order_seq
"""


def window_agg_groups_frame(spark, sf_dir):
    """GROUPS frame (datafusion.proto:651-676 frame unit 2), emulated:
    Spark has no native GROUPS frames, but `GROUPS BETWEEN a PRECEDING
    AND b FOLLOWING` over key k is exactly a RANGE frame of [-a, +b] over
    `dense_rank()` of k — peer rows share a dense_rank value, so rank
    distance counts peer GROUPS, not rows. Two windows over the SAME
    (partition, order): one sort, one shuffle.

    Exercised on a tie-heavy key (order date within priority). The frame
    sum is carried as integer cents — sum(double) over a frame is
    accumulation-order-sensitive and a round(x, 2) straddle would flap
    the oracle hash."""
    o = _t(spark, sf_dir, "orders")
    wo = W.partitionBy("o_orderpriority").orderBy("o_orderdate")
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("_c"),
    ).withColumn("_dr", F.dense_rank().over(wo))
    wg = W.partitionBy("o_orderpriority").orderBy("_dr").rangeBetween(-1, 1)
    return base.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.sum("_c").over(wg).cast("long").alias("grp_sum_cents"),
        F.count(F.lit(1)).over(wg).cast("long").alias("grp_n"),
    ).orderBy("o_orderkey")


WINDOW_AGG_GROUPS_ORACLE = """
WITH c AS (
  SELECT o_orderkey, o_orderpriority, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
g AS (
  SELECT o_orderpriority, o_orderdate,
         sum(cents) AS gs, count(*) AS gn
  FROM c GROUP BY 1, 2),
w AS (
  SELECT o_orderpriority, o_orderdate,
         gs + coalesce(lag(gs)  OVER p, 0) + coalesce(lead(gs) OVER p, 0) AS grp_sum_cents,
         gn + coalesce(lag(gn)  OVER p, 0) + coalesce(lead(gn) OVER p, 0) AS grp_n
  FROM g
  WINDOW p AS (PARTITION BY o_orderpriority ORDER BY o_orderdate))
SELECT c.o_orderkey, c.o_orderpriority, c.o_orderdate,
       CAST(w.grp_sum_cents AS BIGINT) AS grp_sum_cents,
       CAST(w.grp_n AS BIGINT) AS grp_n
FROM c JOIN w ON c.o_orderpriority = w.o_orderpriority
             AND c.o_orderdate = w.o_orderdate
ORDER BY c.o_orderkey
"""


QUERIES = {
    "window_row_number": window_row_number,
    "window_rank_ties": window_rank_ties,
    "window_ntile": window_ntile,
    "window_lag_lead": window_lag_lead,
    "window_first_last_nth": window_first_last_nth,
    "window_agg_rows_frame": window_agg_rows_frame,
    "window_agg_range_frame": window_agg_range_frame,
    "window_agg_groups_frame": window_agg_groups_frame,
    "window_running_total": window_running_total,
}

ORACLES = {
    "window_row_number": WINDOW_ROW_NUMBER_ORACLE,
    "window_rank_ties": WINDOW_RANK_TIES_ORACLE,
    "window_ntile": WINDOW_NTILE_ORACLE,
    "window_lag_lead": WINDOW_LAG_LEAD_ORACLE,
    "window_first_last_nth": WINDOW_FIRST_LAST_NTH_ORACLE,
    "window_agg_rows_frame": WINDOW_AGG_ROWS_ORACLE,
    "window_agg_range_frame": WINDOW_AGG_RANGE_ORACLE,
    "window_agg_groups_frame": WINDOW_AGG_GROUPS_ORACLE,
    "window_running_total": WINDOW_RUNNING_ORACLE,
}
