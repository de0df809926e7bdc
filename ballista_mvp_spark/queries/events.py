"""Event-stream analytics over the `events` table (timestamp, user, type,
value, JSON props) — batch certification here; the Structured Streaming
variant lives in ballista_mvp_spark/streaming/ and is certified in
streaming_tumbling (same aggregation, streaming execution).

The reference has no streaming/time-series operators at all (SURVEY.md
§2.10) — this module is extension surface, built on the same scale rules:
time-bucketed aggs shuffle only (bucket, key) pairs; sessionization is a
window function over a (user, ts) sort, which Spark executes as one
shuffle on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def events_hourly(spark, sf_dir):
    """Tumbling-hour rollup per event type."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), TS_FMT).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_v"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_v,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


def events_json(spark, sf_dir):
    """JSON property extraction (props is a JSON string): typed pull of
    $.k + aggregation. get_json_object is JVM-side."""
    e = _t(spark, sf_dir, "events")
    # try_cast: a single non-integral $.k is NULL (skipped by the aggs),
    # not an ANSI CAST_INVALID_INPUT that kills the whole query; the
    # oracle uses TRY_CAST for the same tolerance
    k = F.expr("try_cast(get_json_object(props, '$.k') AS LONG)")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_ORACLE = """
SELECT event_type, count(*) AS n,
       round(avg(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def fn_json_typed(spark, sf_dir):
    """Schema-full JSON parsing (from_json → typed struct), the typed
    sibling of events_json's get_json_object path: parse once, access
    struct fields, NULL for malformed rows (PERMISSIVE mode), plus
    to_json round-trip and schema_of_json-shaped filtering. One parse
    per row instead of one per extracted path — the difference that
    matters when a props blob carries many fields."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        "event_type",
        F.from_json("props", "k bigint").alias("p"),
    )
    return (
        parsed.select(
            "event_id",
            "event_type",
            F.col("p.k").alias("k"),
            (F.col("p.k") % 10 == 0).cast("int").alias("k_round"),
            F.to_json(F.struct(F.col("p.k").alias("k"))).alias("rejson"),
        )
        .filter(F.col("k").isNotNull())
        .orderBy("event_id")
    )


FN_JSON_TYPED_ORACLE = """
SELECT event_id, event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 = 0 AS INT) AS k_round,
       '{"k":' || CAST(json_extract(props, '$.k') AS BIGINT) || '}' AS rejson
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
ORDER BY event_id
"""


def events_sessionize(spark, sf_dir):
    """Sessionization: 30-minute inactivity gap starts a new session.
    lag → gap flag → running sum = session id; then per-user session
    stats. One shuffle (user_id)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-precision gap: unix_timestamp TRUNCATES to seconds, so
    # a 1800.5s gap would read 1800 and wrongly merge sessions (the ts
    # column is µs-grained; the oracle's epoch() is fractional)
    gap_flag = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > 1800 * 1_000_000
        ),
        1,
    ).otherwise(0)
    sess = e.select(
        "user_id", "ts", "event_id", F.sum(gap_flag).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("session_id")
    )
    per_session = sess.groupBy("user_id", "session_id").agg(F.count("*").alias("sess_len"))
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("sess_len").alias("n_events"),
            F.max("sess_len").alias("max_sess_len"),
        )
        .orderBy("user_id")
    )


EVENTS_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
per_session AS (
  SELECT user_id, session_id, count(*) AS sess_len
  FROM sessions GROUP BY user_id, session_id)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(sess_len) AS BIGINT) AS n_events,
       max(sess_len) AS max_sess_len
FROM per_session GROUP BY user_id ORDER BY user_id
"""


def events_topk_users(spark, sf_dir):
    """Top-20 users by total event value (TakeOrderedAndProject over a
    pre-aggregated shuffle — never a global sort of raw events)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("total_v"), F.count("*").alias("n"))
        .orderBy(F.col("total_v").desc(), F.col("user_id"))
        .limit(20)
    )


EVENTS_TOPK_ORACLE = """
SELECT user_id, round(sum(value), 4) AS total_v, count(*) AS n
FROM events GROUP BY user_id
ORDER BY total_v DESC, user_id LIMIT 20
"""


def events_type_share(spark, sf_dir):
    """Per-type share of total volume — window aggregate over an agg
    (two-level aggregation without a second shuffle: the window over the
    tiny agg output runs in one partition)."""
    e = _t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(F.count("*").alias("n"))
    return agg.select(
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(W.partitionBy()), 6).alias("share"),
    ).orderBy("event_type")


EVENTS_TYPE_SHARE_ORACLE = """
SELECT event_type, n, round(n * 1.0 / sum(n) OVER (), 6) AS share
FROM (SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
ORDER BY event_type
"""


def streaming_tumbling(spark, sf_dir):
    """Structured Streaming execution of the hourly rollup: readStream
    over the events parquet → tumbling window(ts, 1 hour) → complete-mode
    memory sink, drained synchronously. Same aggregation as events_hourly
    → certified against the same batch oracle."""
    from ..streaming import run_tumbling_batchfile

    return run_tumbling_batchfile(spark, sf_dir)


STREAMING_TUMBLING_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_v
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


def streaming_sliding(spark, sf_dir):
    """Structured Streaming sliding-window rollup: 1 h windows sliding
    every 15 min, so each event lands in 4 overlapping windows —
    window(ts, len, slide) expansion under the streaming engine,
    complete-mode memory sink. Oracle replays the identical expansion in
    SQL: window starts are time_bucket(15 min) − k·15 min for k = 0..3
    (epoch-aligned, exactly Spark's window assignment)."""
    from ..streaming import run_sliding_batchfile

    return run_sliding_batchfile(spark, sf_dir)


STREAMING_SLIDING_ORACLE = """
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes',
                '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type, count(*) AS n
FROM events, unnest(generate_series(0, 3)) AS u(k)
GROUP BY 1, 2 ORDER BY w_start, event_type
"""


def events_trailing_window(spark, sf_dir):
    """Time-interval RANGE frame: per event, the count and value-sum of
    the same user's events in the trailing hour [ts-1h, ts] — the frame
    variant (interval offsets over event time) the numeric
    window_agg_range_frame doesn't exercise. Spark expresses it as a
    RANGE frame over epoch MICROseconds — both engines' timestamp
    precision; framing on truncated epoch seconds admits pairs 3600.x s
    apart that the oracle's native INTERVAL frame excludes (caught at
    sf0.1). The oracle uses DuckDB's native INTERVAL frame. Sum carried as integer value-cents (frame sums of
    doubles are accumulation-order-sensitive)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("_e").rangeBetween(-3_600_000_000, 0)
    return (
        e.select(
            "event_id",
            "user_id",
            F.date_format("ts", TS_FMT).alias("ts_s"),
            F.unix_micros("ts").alias("_e"),
            F.round(F.col("value") * 100).cast("long").alias("_c"),
        )
        .withColumn("trail_n", F.count("*").over(w).cast("long"))
        .withColumn("trail_sum_cents", F.sum("_c").over(w).cast("long"))
        .drop("_c", "_e")
        .orderBy("event_id")
    )


EVENTS_TRAILING_WINDOW_ORACLE = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(count(*) OVER tw AS BIGINT) AS trail_n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER tw AS BIGINT) AS trail_sum_cents
FROM events
WINDOW tw AS (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def events_gapfill(spark, sf_dir):
    """Time-series gap filling: the dense (event_type × hour) grid over
    the corpus's [min, max] hour range with zero-filled counts for silent
    hours — the step every downstream window/forecast op needs before it
    can assume regular spacing.

    Scale shape: the hour grid is sequence(min, max, 1 hour) exploded
    from a broadcast 1-row aggregate (grid size = hours × types, tiny vs
    events), then a LEFT join from grid to the hourly rollup — the only
    corpus-scale work is the rollup itself (two-phase agg, one shuffle)."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    types = e.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
        )
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            F.date_format("h", TS_FMT).alias("hour"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_GAPFILL_ORACLE = """
WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1 FROM events),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT h0 FROM b), (SELECT h1 FROM b), INTERVAL 1 HOUR)) AS h) g),
hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT strftime(grid.h, '%Y-%m-%d %H:%M:%S') AS hour,
       grid.event_type AS event_type,
       CAST(coalesce(hourly.n, 0) AS BIGINT) AS n
FROM grid LEFT JOIN hourly ON grid.h = hourly.h AND grid.event_type = hourly.event_type
ORDER BY hour, grid.event_type
"""


def streaming_dedup(spark, sf_dir):
    """Streaming deduplication: first event per (user, event_type, hour)
    through the streaming state store, watermark bounding dedup state.
    The surviving physical row is arrival-order dependent, so the
    certified output is the key set — exact vs a batch SELECT DISTINCT."""
    from ..streaming import run_stream_dedup_batchfile

    return run_stream_dedup_batchfile(spark, sf_dir)


STREAMING_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour
FROM events ORDER BY user_id, event_type, hour
"""


def events_asof_join(spark, sf_dir):
    """As-of join (extension — absent from the reference, SURVEY.md §2.4):
    for every 'view' event, the most recent 'purchase' value by the same
    user at-or-before it. Union+window implementation (operators/asof.py);
    oracle uses DuckDB's native ASOF JOIN."""
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round("value", 6).alias("purchase_v")
    )
    out = asof_join(
        views, purchases, key="user_id", left_time="ts", right_time="ts",
        value_cols=["purchase_v"],
    )
    return out.select(
        "event_id", "user_id", F.date_format("ts", TS_FMT).alias("ts_s"), "purchase_v"
    ).orderBy("event_id")


EVENTS_ASOF_ORACLE = """
SELECT v.event_id, v.user_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       round(p.value, 6) AS purchase_v
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id AND p.ts <= v.ts
ORDER BY event_id
"""


def events_asof_tolerance(spark, sf_dir):
    """Forward as-of join with a tolerance bound: for every 'view' event,
    the NEXT 'purchase' value by the same user at-or-after it, nulled
    when that purchase is more than 48h out (pandas merge_asof
    direction='forward', tolerance). Same union+window plan as the
    backward case — the tolerance is a carried-column filter, not an
    extra join."""
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round("value", 6).alias("next_v")
    )
    out = asof_join(
        views, purchases, key="user_id", left_time="ts", right_time="ts",
        value_cols=["next_v"], direction="forward",
        tolerance_seconds=48 * 3600,
    )
    return out.select(
        "event_id", "user_id", F.date_format("ts", TS_FMT).alias("ts_s"), "next_v"
    ).orderBy("event_id")


EVENTS_ASOF_TOLERANCE_ORACLE = """
SELECT v.event_id, v.user_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CASE WHEN epoch(p.ts) - epoch(v.ts) <= 48 * 3600
            THEN round(p.value, 6) END AS next_v
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id AND p.ts >= v.ts
ORDER BY event_id
"""


def events_range_join(spark, sf_dir):
    """Range (interval) join (extension — absent from the reference):
    purchases within 1 hour after each signup by the same user.
    Bucketed equi-join + residual (operators/asof.range_join)."""
    from ..operators.asof import range_join

    e = _t(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", F.col("ts").alias("s_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value"
    )
    joined = range_join(
        signups,
        purchases.withColumnRenamed("p_user", "user_id"),
        F.col("s_ts"),
        F.col("p_ts"),
        lower_seconds=0,
        upper_seconds=3600,
        extra_key="user_id",
    )
    return (
        joined.groupBy("signup_id")
        .agg(F.count("*").alias("n_purch"), F.round(F.sum("value"), 6).alias("v_purch"))
        .orderBy("signup_id")
    )


EVENTS_RANGE_JOIN_ORACLE = """
SELECT s.event_id AS signup_id, count(*) AS n_purch, round(sum(p.value), 6) AS v_purch
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON s.user_id = p.user_id
 AND epoch(p.ts) >= epoch(s.ts) AND epoch(p.ts) <= epoch(s.ts) + 3600
GROUP BY s.event_id ORDER BY signup_id
"""


def events_retention(spark, sf_dir):
    """Cohort retention: for each user take the first active day (cohort
    anchor), then count distinct users active k days later. Two shuffles
    (user_id for the anchor, k for the final count) — row count drops to
    distinct (user, day) before the heavy join."""
    e = _t(spark, sf_dir, "events")
    days = e.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    first = days.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        days.join(first, "user_id")
        .select("user_id", F.datediff("d", "d0").alias("k"))
        .groupBy("k")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("k")
    )


EVENTS_RETENTION_ORACLE = """
WITH days AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
first AS (SELECT user_id, min(d) AS d0 FROM days GROUP BY user_id)
SELECT CAST(date_diff('day', d0, d) AS INT) AS k, count(DISTINCT days.user_id) AS n_users
FROM days JOIN first ON days.user_id = first.user_id
GROUP BY 1 ORDER BY k
"""


def events_heatmap(spark, sf_dir):
    """Hour-of-week activity heatmap: event share per (ISO weekday ×
    hour-of-day) cell — the seasonality profile that sizes streaming
    capacity and spots crawl/bot cadence (a flat heatmap is machine
    traffic; humans have nights and weekends). Weekday alignment is
    pinned to ISO (Monday=1) explicitly on BOTH engines — Spark's
    weekday() is 0-based-Monday and DuckDB's dayofweek is
    0-based-Sunday, a classic cross-engine off-by-one.

    One map-side-combined groupBy to ≤168 cells, one broadcast total;
    scan-bound at any scale."""
    e = _t(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.weekday("ts") + 1).alias("isodow"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").alias("total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "isodow",
            "hour",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
        .orderBy("isodow", "hour")
    )


EVENTS_HEATMAP_ORACLE = """
WITH cells AS (
  SELECT CAST(isodow(ts) AS INT) AS isodow, CAST(hour(ts) AS INT) AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2),
tot AS (SELECT sum(n) AS total FROM cells)
SELECT isodow, hour, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / total, 6) AS share
FROM cells, tot ORDER BY isodow, hour
"""


def graph_assortativity(spark, sf_dir):
    """Degree assortativity of the interaction graph: the Pearson
    correlation between the total degrees of the two endpoints of each
    edge — positive means hubs talk to hubs (social-network shape),
    negative means hub-and-spoke (broadcast shape). THE one-number
    graph-health check run before an iterative algorithm is launched:
    strongly negative assortativity predicts the skewed-bucket behavior
    graph_degree profiles node by node.

    Edges come from the shared _interaction_edges chain; total degree
    is one groupBy over the (src ∪ dst) endpoint stream; the edge table
    then joins the slim (node, degree) table twice — KEYED on the
    endpoint, with NO broadcast pin (round-8 unpin: the degree table is
    node-count-sized, i.e. corpus-scaled — AQE broadcasts it while the
    node set is small and co-partitions edges⋈degree on the endpoint
    key when it is not) — and a single corr aggregate (map-side
    co-moments) produces the statistic, rounded 6dp on both engines."""
    e = _t(spark, sf_dir, "events")
    edges = _interaction_edges(e)
    ends = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    dx = deg.select(F.col("node").alias("src"), F.col("degree").alias("dx"))
    dy = deg.select(F.col("node").alias("dst"), F.col("degree").alias("dy"))
    return (
        edges.join(dx, "src")
        .join(dy, "dst")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.round(F.avg("dx"), 6).alias("avg_src_degree"),
            F.round(F.avg("dy"), 6).alias("avg_dst_degree"),
            F.round(
                F.corr(F.col("dx").cast("double"), F.col("dy").cast("double")),
                6,
            ).alias("assortativity"),
        )
    )


GRAPH_ASSORTATIVITY_ORACLE = """
WITH ordered AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type
                             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
  FROM events),
edges AS (SELECT src, dst FROM ordered WHERE dst IS NOT NULL AND dst <> src),
ends AS (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges),
deg AS (SELECT node, count(*) AS degree FROM ends GROUP BY node)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       round(avg(dx.degree), 6) AS avg_src_degree,
       round(avg(dy.degree), 6) AS avg_dst_degree,
       round(corr(CAST(dx.degree AS DOUBLE), CAST(dy.degree AS DOUBLE)), 6)
         AS assortativity
FROM edges
JOIN deg dx ON dx.node = edges.src
JOIN deg dy ON dy.node = edges.dst
"""


def events_cohort_matrix(spark, sf_dir):
    """Weekly cohort retention MATRIX — events_retention's aggregate
    curve expanded into the (cohort_week × week-offset) grid a growth
    dashboard renders: users bucketed by first-active ISO week, each
    later week's active count expressed as a fraction of the cohort's
    size. Both engines truncate to Monday weeks, so the grid is
    byte-identical.

    Row count collapses to distinct (user, week) before anything heavy;
    two user_id-keyed shuffles (anchor + join) and one
    (cohort, k)-keyed count — the events_retention shape with one extra
    broadcast-sized join against the k=0 diagonal for the denominator."""
    e = _t(spark, sf_dir, "events")
    weeks = e.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    first = weeks.groupBy("user_id").agg(F.min("wk").alias("w0"))
    act = weeks.join(first, "user_id").select(
        "user_id",
        F.to_date("w0").alias("cohort_week"),
        (F.datediff("wk", "w0") / 7).cast("int").alias("k"),
    )
    cohort = act.groupBy("cohort_week", "k").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    base = cohort.filter(F.col("k") == 0).select(
        "cohort_week", F.col("n_active").alias("n_cohort")
    )
    return (
        cohort.join(F.broadcast(base), "cohort_week")
        .select(
            "cohort_week",
            "k",
            "n_active",
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort_week", "k")
    )


EVENTS_COHORT_MATRIX_ORACLE = """
WITH weeks AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
first AS (SELECT user_id, min(wk) AS w0 FROM weeks GROUP BY user_id),
act AS (
  SELECT weeks.user_id, CAST(w0 AS DATE) AS cohort_week,
         CAST(date_diff('day', w0, wk) / 7 AS INT) AS k
  FROM weeks JOIN first ON weeks.user_id = first.user_id),
cohort AS (
  SELECT cohort_week, k, count(DISTINCT user_id) AS n_active
  FROM act GROUP BY 1, 2),
base AS (SELECT cohort_week, n_active AS n_cohort FROM cohort WHERE k = 0)
SELECT c.cohort_week, c.k, c.n_active,
       round(c.n_active * 1.0 / b.n_cohort, 6) AS retention_pct
FROM cohort c JOIN base b ON c.cohort_week = b.cohort_week
ORDER BY c.cohort_week, c.k
"""


def streaming_sessionize(spark, sf_dir):
    """Custom STATEFUL streaming operator: per-user sessionization via
    applyInPandasWithState (GroupState across micro-batches;
    streaming/stateful_sessionize). Single-batch drain over the events
    parquet → final state equals the batch sessionization → certified
    against the same oracle as events_sessionize."""
    from ..streaming import run_stateful_sessionize_batchfile

    return run_stateful_sessionize_batchfile(spark, sf_dir)


def streaming_session_close(spark, sf_dir):
    """Event-time-timeout streaming sessionization (emit-on-close): one
    row per FINALIZED session — closed mid-stream by an over-gap event or
    closed by the watermark timing out end+gap (EventTimeTimeout no-data
    batch). Sessions still open at end-of-stream stay in state and are
    NOT emitted; the oracle applies the same closure rule in SQL."""
    from ..streaming import run_session_close_batchfile

    df = run_session_close_batchfile(spark, sf_dir, 1800)
    return df.select(
        "user_id",
        F.round("session_start", 6).alias("session_start"),
        F.round("session_end", 6).alias("session_end"),
        "n_events",
    ).orderBy("user_id", "session_start")


STREAMING_SESSION_CLOSE_ORACLE = """
WITH e AS (SELECT user_id, epoch(ts) AS t, event_id FROM events),
flg AS (
  SELECT user_id, t,
         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                   OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 1800
              THEN 1 ELSE 0 END AS new_s,
         event_id
  FROM e),
sid AS (
  SELECT user_id, t,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flg),
sess AS (
  SELECT user_id, sid, min(t) AS session_start, max(t) AS session_end,
         count(*) AS n_events
  FROM sid GROUP BY 1, 2),
last_s AS (SELECT user_id, max(sid) AS max_sid FROM sess GROUP BY 1)
SELECT sess.user_id, round(session_start, 6) AS session_start,
       round(session_end, 6) AS session_end, CAST(n_events AS INT) AS n_events
FROM sess JOIN last_s ON sess.user_id = last_s.user_id
WHERE sess.sid < last_s.max_sid
   OR session_end + 1800 <= (SELECT max(t) FROM e)
ORDER BY sess.user_id, session_start
"""


def events_attribution(spark, sf_dir):
    """Purchase attribution matrix: for every purchase, the FIRST-touch
    and LAST-touch non-purchase event type of the same user in the 24 h
    lookback window, aggregated to a (first_touch, last_touch) count
    matrix; purchases with an empty window attribute to '(none)'.

    Plan: the lookback is a user_id equi-join with an event-time range
    residual (the interval-join shape — shuffle keys on user_id, no
    cross product), then ONE min/max-of-struct aggregation per purchase
    picks both touches (struct ordering (ts, event_id, type) is total,
    so the pick is deterministic) — no per-purchase windows, no second
    scan. At 100 TB the shuffle carries (purchase, touch) rows bounded
    by per-user activity in 24 h, and the final matrix is |types|²."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    e = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "event_type", "ts", "event_id"
    )
    touches = (
        p.join(
            e,
            (F.col("pu") == F.col("user_id"))
            & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 24 HOURS"))
            & (F.col("ts") < F.col("pts")),
            "inner",
        )
        .groupBy("pid")
        .agg(
            F.min(F.struct("ts", "event_id", "event_type")).alias("_f"),
            F.max(F.struct("ts", "event_id", "event_type")).alias("_l"),
        )
        .select(
            "pid",
            F.col("_f.event_type").alias("first_touch"),
            F.col("_l.event_type").alias("last_touch"),
        )
    )
    return (
        p.join(touches, "pid", "left")
        .groupBy(
            F.coalesce("first_touch", F.lit("(none)")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
        )
        .agg(F.count("*").alias("n_purchases"))
        .orderBy("first_touch", "last_touch")
    )


EVENTS_ATTRIBUTION_ORACLE = """
WITH p AS (
  SELECT event_id AS pid, user_id, ts FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT p.pid, e.event_type, e.ts, e.event_id
  FROM p JOIN events e
    ON e.user_id = p.user_id
   AND e.ts >= p.ts - INTERVAL 24 HOUR
   AND e.ts < p.ts
   AND e.event_type != 'purchase'),
r AS (
  SELECT pid, event_type,
         row_number() OVER (PARTITION BY pid ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY pid ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM t),
ft AS (SELECT pid, event_type AS first_touch FROM r WHERE rn_a = 1),
lt AS (SELECT pid, event_type AS last_touch FROM r WHERE rn_d = 1)
SELECT coalesce(first_touch, '(none)') AS first_touch,
       coalesce(last_touch, '(none)') AS last_touch,
       count(*) AS n_purchases
FROM p LEFT JOIN ft USING (pid) LEFT JOIN lt USING (pid)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_funnel(spark, sf_dir):
    """Ordered first-touch conversion funnel signup → view → click →
    purchase: a user converts at step k iff the first occurrence of step
    k's event is strictly after the first occurrence of step k-1's.

    Plan: ONE shuffle — conditional MIN per (user, step) collapses each
    user to a 4-timestamp row (map-side partial agg does most of the
    work), then a global agg over 150 (at sf0.01; ~1e8 at 100 TB — still
    one slim row per user) rows. No per-step joins, no event re-scan per
    step. The reference has no funnel operator (extension surface)."""
    e = _t(spark, sf_dir, "events")
    steps = ["signup", "view", "click", "purchase"]
    per_user = e.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in steps
        ]
    )
    conds = [F.col("t_signup").isNotNull()]
    for prev, cur in zip(steps, steps[1:]):
        conds.append(conds[-1] & (F.col(f"t_{cur}") > F.col(f"t_{prev}")))
    return per_user.agg(
        *[
            F.count(F.when(c, F.lit(1))).alias(f"n_{s}")
            for s, c in zip(steps, conds)
        ]
    )


EVENTS_FUNNEL_ORACLE = """
WITH u AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'signup')   AS t_signup,
         min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
         min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
         min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
  FROM events GROUP BY user_id)
SELECT
  count(*) FILTER (WHERE t_signup IS NOT NULL) AS n_signup,
  count(*) FILTER (WHERE t_view > t_signup) AS n_view,
  count(*) FILTER (WHERE t_view > t_signup AND t_click > t_view) AS n_click,
  count(*) FILTER (WHERE t_view > t_signup AND t_click > t_view
                     AND t_purchase > t_click) AS n_purchase
FROM u
"""


def events_anomaly(spark, sf_dir):
    """Hourly-count anomaly detection per event type: |z| > 2 vs the
    type's own mean/stddev of hourly counts.

    Plan: hourly rollup (one shuffle on (hour, type)), then per-type
    stats via a SECOND tiny groupBy (5 rows) broadcast-joined back —
    deliberately NOT a window over partitionBy(event_type), which at
    100 TB would funnel every row of a type through one task. Both
    sides guard sigma > 0."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
    ).agg(F.count("*").alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        hourly.join(F.broadcast(stats.where(F.col("sigma") > 0)), "event_type")
        .where(F.abs(z) > 2)
        .select(
            F.date_format("hour_ts", TS_FMT).alias("hour"),
            "event_type",
            "n",
            F.round(z, 4).alias("z"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_ANOMALY_ORACLE = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour_ts, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sigma
  FROM h GROUP BY 1)
SELECT strftime(h.hour_ts, '%Y-%m-%d %H:%M:%S') AS hour, h.event_type, n,
       round((n - mu) / sigma, 4) AS z
FROM h JOIN s ON h.event_type = s.event_type
WHERE sigma > 0 AND abs((n - mu) / sigma) > 2
ORDER BY hour, h.event_type
"""


def events_cum_users(spark, sf_dir):
    """Cumulative distinct users per event type by hour (rows emitted for
    hours where a first-time user appears).

    Spark has no COUNT(DISTINCT) OVER — the scale-correct decomposition
    is first-seen-hour per (type, user) [the only full shuffle], roll up
    to new-users-per-hour [tiny], then a running SUM window over the
    already-aggregated (type, hour) table. State per window partition is
    #hours, not #users — survives 100 TB where collect_set-over-window
    (the naive emulation) would OOM."""
    e = _t(spark, sf_dir, "events")
    fs = e.groupBy("event_type", "user_id").agg(
        F.min(F.date_trunc("hour", "ts")).alias("first_hour")
    )
    nh = fs.groupBy("event_type", F.col("first_hour").alias("hour_ts")).agg(
        F.count("*").alias("new_users")
    )
    w = W.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return nh.select(
        F.date_format("hour_ts", TS_FMT).alias("hour"),
        "event_type",
        F.sum("new_users").over(w).alias("cum_users"),
    ).orderBy("hour", "event_type")


EVENTS_CUM_USERS_ORACLE = """
WITH fs AS (
  SELECT event_type, user_id, min(date_trunc('hour', ts)) AS first_hour
  FROM events GROUP BY 1, 2),
nh AS (
  SELECT event_type, first_hour AS hour_ts, count(*) AS new_users
  FROM fs GROUP BY 1, 2)
SELECT strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY hour_ts
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM nh ORDER BY hour, event_type
"""


def streaming_enrich(spark, sf_dir):
    """Stream-static enrichment: event stream ⋈ customer dimension
    (broadcast per micro-batch; the stream side never shuffles for the
    join), rolled up by market segment — certified against the identical
    batch SQL."""
    from ..streaming import run_stream_static_join_batchfile

    return run_stream_static_join_batchfile(spark, sf_dir)


STREAMING_ENRICH_ORACLE = """
SELECT c_mktsegment, count(*) AS n, round(sum(value), 4) AS sum_v
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def streaming_join(spark, sf_dir):
    """Stream-stream interval self-join (click → purchase by the same
    user within 1 hour) with watermark-bounded join state — certified
    against the batch interval join."""
    from ..streaming import run_stream_stream_join_batchfile

    return run_stream_stream_join_batchfile(spark, sf_dir)


STREAMING_JOIN_ORACLE = """
SELECT c.user_id, c.event_id AS c_id, p.event_id AS p_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
ORDER BY c.user_id, c_id, p_id
"""


def events_session_window(spark, sf_dir):
    """Spark's NATIVE session-window operator (F.session_window — merging
    gap-sessions inside the aggregation itself, one shuffle on user_id;
    the same groupBy runs unchanged as a streaming query with a
    watermark). Complements the custom applyInPandasWithState
    sessionization (streaming_sessionize) with the built-in path.
    Boundary semantics: a gap of EXACTLY the 30-min window starts a new
    session, so the oracle walks gaps at microsecond precision with
    >= 1800s."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), TS_FMT).alias("s_start"),
            F.date_format(
                F.col("session_window.end") - F.expr("INTERVAL 30 MINUTES"), TS_FMT
            ).alias("s_last"),
            "n",
        )
        .orderBy("user_id", "s_start")
    )


EVENTS_SESSION_WINDOW_ORACLE = """
WITH flg AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sid AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flg)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS s_last, count(*) AS n
FROM sid GROUP BY user_id, sid ORDER BY user_id, s_start
"""


def events_ohlc(spark, sf_dir):
    """OHLC candlestick rollup per hour: open/close via MIN_BY/MAX_BY
    (the arg-min/arg-max aggregates — FirstValue/LastValue's order-aware
    cousins), high/low/volume alongside, all in ONE two-phase hash agg —
    no window, no self-join, the single-shuffle form of "first and last
    per bucket". ts is verified unique in the data, so the selectors are
    deterministic."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format(F.date_trunc("hour", "ts"), TS_FMT).alias("hour"))
        .agg(
            F.min_by("value", "ts").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max_by("value", "ts").alias("close_v"),
            F.count("*").alias("n"),
        )
        .orderBy("hour")
    )


EVENTS_OHLC_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       arg_min(value, ts) AS open_v,
       max(value) AS high_v,
       min(value) AS low_v,
       arg_max(value, ts) AS close_v,
       count(*) AS n
FROM events GROUP BY 1 ORDER BY hour
"""


def _interaction_edges(e: DataFrame) -> DataFrame:
    """Deterministic user-interaction graph: within each event_type, an
    edge from each event's user to the NEXT event's user in (ts,
    event_id) order — the "who acts after whom" chain. Self-loops
    dropped. One window shuffle on event_type; edges are 16-byte
    (src, dst) rows."""
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        e.select("event_type", "ts", "event_id", F.col("user_id").alias("src"))
        .withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .select("src", "dst")
    )


def graph_pagerank(spark, sf_dir):
    """PageRank (5 iterations, damping 0.85) over the user-interaction
    graph — the domain/source-ranking quality signal of crawl curation
    (à la Common-Crawl host ranking), as K chained join+agg shuffles
    (operators/graph.py). Top-100 users by rank."""
    from ..operators import graph as G

    e = _t(spark, sf_dir, "events")
    ranks = G.pagerank(_interaction_edges(e), "src", "dst", iterations=5)
    return (
        ranks.select(F.col("node").alias("user_id"), "rank")
        .orderBy(F.col("rank").desc(), "user_id")
        .limit(100)
    )


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration PageRank in ANSI SQL (DuckDB forbids
    aggregates in a recursive CTE member, so the fixed iteration count
    is unrolled — same rule, same numbers)."""
    steps = []
    prev = "r0"
    for i in range(1, 6):
        steps.append(
            f"""r{i} AS (
  SELECT n.node, 0.15 + 0.85 * coalesce(c.s, 0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT t.dst AS node, sum(t.p * r.rank) AS s
    FROM trans t JOIN {prev} r ON t.src = r.node GROUP BY t.dst
  ) c ON n.node = c.node)"""
        )
        prev = f"r{i}"
    return f"""
WITH ordered AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type
                             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
  FROM events),
e AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
  FROM ordered WHERE dst IS NOT NULL AND dst <> src GROUP BY src, dst),
trans AS (
  SELECT e.src, e.dst, e.w / o.ow AS p
  FROM e JOIN (SELECT src, sum(w) AS ow FROM e GROUP BY src) o ON e.src = o.src),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
r0 AS (SELECT node, 1.0 AS rank FROM nodes),
{",".join(steps)}
SELECT node AS user_id, round(rank, 6) AS rank
FROM r5 ORDER BY rank DESC, user_id LIMIT 100
"""


GRAPH_PAGERANK_ORACLE = _pagerank_oracle()


def graph_ppr(spark, sf_dir):
    """Personalized PageRank (Haveliwala, WWW 2002) from a deterministic
    seed cohort (user_id % 97 == 0, ~1% of nodes) over the interaction
    graph — 'relevance to THESE users', the seeded-recommendation /
    trust-propagation primitive that global graph_pagerank can't
    express. Same 5 unrolled iterations, damping 0.85
    (operators/graph.personalized_pagerank); top-100 nonzero scores by
    rounded rank, node tiebreak."""
    from ..operators import graph as G

    e = _t(spark, sf_dir, "events")
    edges = _interaction_edges(e)
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst"))
    ).distinct()
    seeds = nodes.filter(F.col("node") % 97 == 0)
    ranks = G.personalized_pagerank(edges, seeds, "src", "dst", iterations=5)
    return (
        ranks.filter(F.col("rank") > 0)
        .select(F.col("node").alias("user_id"), F.col("rank").alias("ppr"))
        .orderBy(F.col("ppr").desc(), "user_id")
        .limit(100)
    )


def _ppr_oracle() -> str:
    steps = []
    prev = "r0"
    for i in range(1, 6):
        steps.append(
            f"""r{i} AS (
  SELECT b.node, 0.15000000000000002 * b.tele + 0.85 * coalesce(c.s, 0) AS rank
  FROM base b LEFT JOIN (
    SELECT t.dst AS node, sum(t.p * r.rank) AS s
    FROM trans t JOIN {prev} r ON t.src = r.node GROUP BY t.dst
  ) c ON b.node = c.node)"""
        )
        prev = f"r{i}"
    return f"""
WITH ordered AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type
                             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
  FROM events),
e AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
  FROM ordered WHERE dst IS NOT NULL AND dst <> src GROUP BY src, dst),
trans AS (
  SELECT e.src, e.dst, e.w / o.ow AS p
  FROM e JOIN (SELECT src, sum(w) AS ow FROM e GROUP BY src) o ON e.src = o.src),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
seeds AS (SELECT node FROM nodes WHERE node % 97 = 0),
ns AS (SELECT count(*) AS c FROM seeds),
base AS (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.c ELSE 0.0 END AS tele
  FROM nodes n LEFT JOIN seeds s ON n.node = s.node, ns),
r0 AS (SELECT node, tele AS rank FROM base),
{",".join(steps)}
SELECT node AS user_id, round(rank, 6) AS ppr
FROM {prev} WHERE round(rank, 6) > 0
ORDER BY ppr DESC, user_id LIMIT 100
"""


GRAPH_PPR_ORACLE = _ppr_oracle()


def graph_degree(spark, sf_dir):
    """In/out degree per node of the interaction graph (multi-edges
    counted) — the graph-profile primitive (hub detection, skew audit
    before an iterative algorithm is launched)."""
    from ..operators import graph as G

    e = _t(spark, sf_dir, "events")
    return G.degree_stats(_interaction_edges(e), "src", "dst").orderBy("node")


GRAPH_DEGREE_ORACLE = """
WITH ordered AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type
                             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
  FROM events),
edges AS (SELECT src, dst FROM ordered WHERE dst IS NOT NULL AND dst <> src),
o AS (SELECT src AS node, count(*) AS out_degree FROM edges GROUP BY src),
i AS (SELECT dst AS node, count(*) AS in_degree FROM edges GROUP BY dst)
SELECT coalesce(o.node, i.node) AS node,
       coalesce(out_degree, 0) AS out_degree,
       coalesce(in_degree, 0) AS in_degree
FROM o FULL JOIN i ON o.node = i.node
ORDER BY node
"""


def graph_triangles(spark, sf_dir):
    """Triangle participation per node of the interaction graph —
    community-density profiling (operators/graph.triangle_counts: wedge
    join + probe join on canonical a<b<c pairs, two 16-byte-key
    shuffles). Top-20 by participation, node tiebreak."""
    from ..operators import graph as G

    e = _t(spark, sf_dir, "events")
    return (
        G.triangle_counts(_interaction_edges(e), "src", "dst")
        .orderBy(F.col("n_triangles").desc(), "node")
        .limit(20)
    )


GRAPH_TRIANGLES_ORACLE = """
WITH ordered AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type
                             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
  FROM events),
dir_edges AS (SELECT src, dst FROM ordered WHERE dst IS NOT NULL AND dst <> src),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM dir_edges WHERE src <> dst),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
per_node AS (
  SELECT node, count(*) AS n_triangles
  FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node)
SELECT node, n_triangles FROM per_node
ORDER BY n_triangles DESC, node LIMIT 20
"""


def graph_components(spark, sf_dir):
    """Connected components — duplicate-cluster labeling certified
    end-to-end against a closed-form oracle. The graph is a
    binary-lifting tree inside each (lang, source) document group: rank
    docs by doc_id, edge (rank r DIV 2) -> r for every r >= 2, so each
    group is one connected tree of diameter O(log group size) and the
    iterative min-label propagation (operators/dedup.connected_components,
    the same loop the MinHash dedup clustering uses) must converge every
    group to comp = min(doc_id) — which the oracle computes directly as a
    window MIN per group, no recursion needed. Round count stays
    logarithmic as the corpus scales (sf0.01 ~5 rounds, 100 TB ~20), and
    the per-round cost is one (id)-keyed join + min-agg over 16-byte
    rows; singleton-free here by construction, but the operator labels
    non-edge nodes with a final left join, exercised by every group of
    size 1."""
    from ..operators import dedup as D

    d = _t(spark, sf_dir, "documents")
    w = W.partitionBy("lang", "source").orderBy("doc_id")
    ranked = d.select(
        "lang", "source", "doc_id", F.row_number().over(w).alias("r")
    )
    parents = ranked.select(
        "lang", "source", F.col("doc_id").alias("a"), F.col("r").alias("pr")
    )
    edges = (
        ranked.filter(F.col("r") >= 2)
        .select(
            "lang", "source", F.col("doc_id").alias("b"), F.expr("r DIV 2").alias("pr")
        )
        .join(parents, ["lang", "source", "pr"])
        .select("a", "b")
    )
    nodes = d.select(F.col("doc_id").alias("id"))
    return D.connected_components(nodes, edges).orderBy("id")


GRAPH_COMPONENTS_ORACLE = """
SELECT doc_id AS id,
       min(doc_id) OVER (PARTITION BY lang, source) AS comp
FROM documents
ORDER BY id
"""


def graph_components_twophase(spark, sf_dir):
    """The diameter-independent variant of graph_components: same
    binary-lifting tree per (lang, source) group, labeled by the
    alternating large-star/small-star contraction
    (operators/dedup.connected_components_twophase, Kiveris et al. SoCC
    2014 — O(log² n) rounds on ANY graph). Certifying BOTH algorithms
    against the same closed-form oracle proves they agree with each
    other and with ground truth — the swap-in story for unbounded-
    diameter duplicate chains is tested, not aspirational."""
    from ..operators import dedup as D

    d = _t(spark, sf_dir, "documents")
    w = W.partitionBy("lang", "source").orderBy("doc_id")
    ranked = d.select(
        "lang", "source", "doc_id", F.row_number().over(w).alias("r")
    )
    parents = ranked.select(
        "lang", "source", F.col("doc_id").alias("a"), F.col("r").alias("pr")
    )
    edges = (
        ranked.filter(F.col("r") >= 2)
        .select(
            "lang", "source", F.col("doc_id").alias("b"), F.expr("r DIV 2").alias("pr")
        )
        .join(parents, ["lang", "source", "pr"])
        .select("a", "b")
    )
    nodes = d.select(F.col("doc_id").alias("id"))
    return D.connected_components_twophase(nodes, edges).orderBy("id")


def events_ab_test(spark, sf_dir):
    """A/B experiment readout: users split by user_id parity, conversion
    = `purchase` events are >= 20% of the user's activity (a rate-based
    definition so both arms stay non-degenerate at every corpus size);
    two-proportion pooled z-test on the
    conversion-rate delta (textbook Wald z, e.g. Casella & Berger §8) —
    the decision gate of any data-curation ablation. Two map-side-
    combined aggregates (per-user collapse, then one global conditional
    agg) and pure column arithmetic on the single result row; at 100 TB
    the per-user collapse is the only real shuffle and it keys on
    user_id."""
    e = _t(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                / F.count("*")
                >= 0.2
            )
            .cast("int")
            .alias("conv")
        )
        .withColumn("v", F.pmod("user_id", F.lit(2)))
    )
    raw = per_user.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("v") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("v") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    # nullif guards: an all-one-parity user slice (empty arm) must read
    # NULL rates, not an ANSI DIVIDE_BY_ZERO that kills the job
    na = F.nullif(F.col("n_a").cast("double"), F.lit(0.0))
    nb = F.nullif(F.col("n_b").cast("double"), F.lit(0.0))
    p_a = F.col("conv_a") / na
    p_b = F.col("conv_b") / nb
    pool = (F.col("conv_a") + F.col("conv_b")) / F.nullif(
        (F.col("n_a") + F.col("n_b")).cast("double"), F.lit(0.0)
    )
    se = F.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    z = (p_a - p_b) / F.nullif(se, F.lit(0.0))
    return raw.select(
        "n_a",
        "conv_a",
        F.round(p_a, 6).alias("cr_a"),
        "n_b",
        "conv_b",
        F.round(p_b, 6).alias("cr_b"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


EVENTS_AB_TEST_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              / CAST(count(*) AS DOUBLE) >= 0.2 AS INT) AS conv,
         user_id % 2 AS v
  FROM events GROUP BY user_id),
raw AS (
  SELECT CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
  FROM per_user),
z AS (
  SELECT *,
         (conv_a / nullif(CAST(n_a AS DOUBLE), 0.0) - conv_b / nullif(CAST(n_b AS DOUBLE), 0.0))
         / nullif(sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                       * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                       * (1.0 / nullif(n_a, 0) + 1.0 / nullif(n_b, 0))), 0.0) AS zv
  FROM raw)
SELECT n_a, conv_a,
       round(conv_a / nullif(CAST(n_a AS DOUBLE), 0.0), 6) AS cr_a,
       n_b, conv_b,
       round(conv_b / nullif(CAST(n_b AS DOUBLE), 0.0), 6) AS cr_b,
       round(zv, 4) AS z_score,
       abs(zv) > 1.96 AS significant_95
FROM z
"""


def events_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user — gaps-and-
    islands: distinct (user, day), day-index minus row_number is the
    island key, max island span is the streak. One shuffle on user_id;
    state bounded by active days per user."""
    e = _t(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.datediff(F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01")).alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("g", F.col("d") - F.row_number().over(w))
    streaks = isl.groupBy("user_id", "g").agg(F.count("*").alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(F.count("*").alias("n_streaks"), F.max("len").alias("longest_streak"))
        .join(
            days.groupBy("user_id").agg(F.count("*").alias("n_active_days")),
            "user_id",
        )
        .select("user_id", "n_active_days", "n_streaks", "longest_streak")
        .orderBy("user_id")
    )


EVENTS_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE)) AS d
  FROM events),
isl AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS g
  FROM days),
streaks AS (
  SELECT user_id, g, count(*) AS len FROM isl GROUP BY user_id, g),
agg AS (
  SELECT user_id, count(*) AS n_streaks, max(len) AS longest_streak
  FROM streaks GROUP BY user_id),
act AS (SELECT user_id, count(*) AS n_active_days FROM days GROUP BY user_id)
SELECT agg.user_id, n_active_days, n_streaks, longest_streak
FROM agg JOIN act ON agg.user_id = act.user_id
ORDER BY agg.user_id
"""


def events_wau_mau(spark, sf_dir):
    """Engagement rollup: per ISO week — weekly active users, the
    enclosing month's active users (computed independently), and the
    WAU/MAU stickiness ratio; a week belongs to the month containing
    its Thursday (ISO 8601), so every week yields exactly ONE row even
    across month boundaries. Two distinct-count shuffles over slim
    (period, user) pairs joined on the month key; the distinct
    pre-reduction means shuffle rows are bounded by active (user,
    period) pairs, not events."""
    e = _t(spark, sf_dir, "events")
    # the week's enclosing month is the month of its THURSDAY (ISO 8601
    # week-ownership rule): keying on the EVENT's month split boundary
    # weeks into two partial rows, each under-counting WAU and
    # double-counting straddling users
    wk = e.select(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        F.date_format(
            F.date_add(F.to_date(F.date_trunc("week", "ts")), 3), "yyyy-MM"
        ).alias("month"),
        "user_id",
    ).distinct()
    wau = wk.groupBy("week", "month").agg(F.countDistinct("user_id").alias("wau"))
    mau = (
        e.select(
            F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
            "user_id",
        )
        .distinct()
        .groupBy("month")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        wau.join(mau, "month")
        .select(
            "week",
            "month",
            "wau",
            "mau",
            F.round(F.col("wau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("week")
    )


EVENTS_WAU_MAU_ORACLE = """
WITH wk AS (
  SELECT DISTINCT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         strftime(date_trunc('week', ts) + INTERVAL 3 DAY, '%Y-%m') AS month,
         user_id
  FROM events),
wau AS (SELECT week, month, count(DISTINCT user_id) AS wau FROM wk GROUP BY 1, 2),
mau AS (
  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
         count(DISTINCT user_id) AS mau
  FROM events GROUP BY 1)
SELECT week, wau.month AS month, wau, mau,
       round(wau * 1.0 / mau, 6) AS stickiness
FROM wau JOIN mau ON wau.month = mau.month
ORDER BY week
"""


def events_paths(spark, sf_dir):
    """Frequent user-journey mining: top-20 length-3 event-type paths
    across per-user (ts, event_id)-ordered histories. One groupBy(user)
    shuffle builds each user's ordered sequence (collect_list of structs
    + array_sort — order is data-defined, not partition-defined), paths
    are array slices (no second explode-join), and the path count is a
    map-side-combined groupBy. Top-20 compiles to TakeOrderedAndProject."""
    e = _t(spark, sf_dir, "events")
    seq = (
        e.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ).alias("_seq")
        )
        .where(F.size("_seq") >= 3)
    )
    paths = seq.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_seq") - 2),
                lambda i: F.concat_ws(
                    ">", F.get("_seq", i - 1), F.get("_seq", i), F.get("_seq", i + 1)
                ),
            )
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


EVENTS_PATHS_ORACLE = """
WITH seq AS (
  SELECT user_id,
         list(event_type ORDER BY CAST(ts AS TIMESTAMP), event_id) AS s
  FROM events GROUP BY user_id HAVING count(*) >= 3),
p AS (
  SELECT s[i] || '>' || s[i+1] || '>' || s[i+2] AS path
  FROM seq, unnest(generate_series(1, len(s) - 2)) AS u(i))
SELECT path, count(*) AS n FROM p GROUP BY path
ORDER BY n DESC, path LIMIT 20
"""


def events_ewma(spark, sf_dir):
    """Exponentially-weighted moving average of daily event counts per
    type (adjusted EWMA, alpha=0.3). The recurrence y_t = a*x_t +
    (1-a)*y_{t-1} is closed-form as a ratio of two cumulative sums with
    weights p^{-i} (p = 1-a, i = day index): the p^t factors cancel in
    the ratio, so the whole thing is two running sums over one window —
    one shuffle on event_type, partitions bounded by #days (p^{-i} stays
    finite to ~900 daily points at p=0.7, far past any real partition).
    No recursion, no Python, no iterative loop."""
    e = _t(spark, sf_dir, "events")
    p = 0.7  # 1 - alpha
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    wo = W.partitionBy("event_type").orderBy("day")
    d2 = daily.withColumn("_i", F.row_number().over(wo).cast("double"))
    wc = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    num = F.sum(F.col("n") * F.pow(F.lit(p), -F.col("_i"))).over(wc)
    den = F.sum(F.pow(F.lit(p), -F.col("_i"))).over(wc)
    return (
        d2.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(num / den, 6).alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


EVENTS_EWMA_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                 AS DOUBLE) AS _i
  FROM daily
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
       round(sum(n * pow(0.7, -_i)) OVER w / sum(pow(0.7, -_i)) OVER w,
             6) AS ewma
FROM idx
WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
"""


def events_markov(spark, sf_dir):
    """First-order Markov transition matrix over event types: per user,
    consecutive event pairs (ts then event_id ordering) counted into
    (src_type → dst_type) cells with row-normalized probabilities — the
    sequence-model prior behind next-action prediction and anomaly
    scoring. One shuffle on user_id for the lag window, one tiny
    (|types|²) aggregation; the probability normalization is a window
    over the cell table, not the corpus."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").cast("timestamp"), "event_id")
    pairs = (
        e.select(
            "user_id",
            F.col("event_type").alias("src_type"),
            F.lead("event_type").over(w).alias("dst_type"),
        )
        .filter(F.col("dst_type").isNotNull())
    )
    cells = pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return cells.select(
        "src_type",
        "dst_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(W.partitionBy("src_type")), 6
        ).alias("prob"),
    ).orderBy("src_type", "dst_type")


EVENTS_MARKOV_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type AS src_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS dst_type
  FROM events),
cells AS (
  SELECT src_type, dst_type, count(*) AS n
  FROM ordered WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type)
SELECT src_type, dst_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY src_type), 6) AS prob
FROM cells ORDER BY src_type, dst_type
"""


def graph_bfs(spark, sf_dir):
    """Multi-source BFS hop distance (≤4 hops) over the undirected
    interaction graph from the seed set {nodes with user_id%50==0} —
    contamination-radius / influence-set analytics
    (operators/graph.bfs_distances: per-hop frontier equi-join +
    visited anti-join, shuffles O(frontier edges), fixed hop budget).
    The oracle unrolls the same four frontier expansions in SQL."""
    from ..operators import graph as G

    e = _t(spark, sf_dir, "events")
    edges = _interaction_edges(e)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(F.col("node") % 50 == 0)
    return (
        G.bfs_distances(edges, seeds, "src", "dst", max_hops=4)
        .select(F.col("node").alias("user_id"), "dist")
        .orderBy("user_id")
    )


def _bfs_oracle() -> str:
    hops = []
    visited = "d0"
    for k in range(1, 5):
        prev_frontier = f"d{k - 1}"
        hops.append(
            f"""f{k} AS (
  SELECT DISTINCT s.v AS node FROM sym s
  JOIN {prev_frontier} p ON s.u = p.node),
d{k} AS (
  SELECT node, {k} AS dist FROM f{k}
  WHERE node NOT IN (SELECT node FROM {visited}))"""
        )
        visited = f"(SELECT node FROM {visited} UNION SELECT node FROM d{k})"
    return f"""
WITH ordered AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type
                             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
  FROM events),
dir_edges AS (SELECT src, dst FROM ordered WHERE dst IS NOT NULL AND dst <> src),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM dir_edges),
sym AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und),
nodes AS (SELECT DISTINCT u AS node FROM sym),
d0 AS (SELECT node, 0 AS dist FROM nodes WHERE node % 50 = 0),
{",".join(hops)}
SELECT node AS user_id, dist
FROM (SELECT * FROM d0 UNION ALL SELECT * FROM d1 UNION ALL SELECT * FROM d2
      UNION ALL SELECT * FROM d3 UNION ALL SELECT * FROM d4)
ORDER BY user_id
"""


GRAPH_BFS_ORACLE = _bfs_oracle()


def streaming_cdc_upsert(spark, sf_dir):
    """End-to-end CDC apply through the STREAMING engine into the
    versioned transaction log (sources/versioned.cdc_merge_sink): the
    events table becomes a change stream keyed by user_id with
    event_id as the change-sequence column; each micro-batch keeps the
    latest change per key and MERGE-commits it, so the table converges
    to the latest row per user instead of an append log.

    Each user's full history is routed to exactly ONE batch file
    (user_id % 3), which makes the final state independent of batch
    order: the within-batch max-seq row IS that user's global latest
    change. The oracle states the converged semantics directly —
    arg-max by event_id per user. Watermark-free availableNow drain;
    batch-id-stamped commits keep the sink exactly-once under replay
    (restart/idempotency covered in tests/test_versioned.py)."""
    import os
    import shutil
    import tempfile

    from ..sources import versioned as V

    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    tdir = tempfile.mkdtemp(prefix="bms_cdc_")
    src = os.path.join(tdir, "src")
    tbl = os.path.join(tdir, "tbl")
    ckpt = os.path.join(tdir, "ckpt")
    try:
        for b in range(3):
            e.filter(F.col("user_id") % 3 == b).coalesce(1).write.parquet(
                os.path.join(src, f"b{b}")
            )
        q = (
            spark.readStream.schema(
                "event_id bigint, user_id bigint, event_type string, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
            .writeStream.foreachBatch(
                V.cdc_merge_sink(
                    tbl, key="user_id", seq_col="event_id",
                    stats_cols=["user_id"],
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = [
            (r.user_id, r.event_type, float(r.value))
            for r in V.read_versioned(spark, tbl).collect()
        ]
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return spark.createDataFrame(
        rows, "user_id bigint, last_type string, last_value double"
    ).orderBy("user_id")


STREAMING_CDC_UPSERT_ORACLE = """
SELECT user_id, max_by(event_type, event_id) AS last_type,
       max_by(value, event_id) AS last_value
FROM events GROUP BY user_id ORDER BY user_id
"""


def events_interarrival(spark, sf_dir):
    """Inter-arrival-time distribution per event type: the gap from a
    user's previous event (any type) to the current one, summarized as
    exact count/min/max plus interpolated p50/p90/p99 — the latency
    profile behind session-gap threshold tuning (events_sessionize's
    1800 s cutoff) and bot detection (sub-second p50 gaps).

    One shuffle keyed on user_id computes the lag; gaps stay in exact
    epoch MICROsecond integers (second truncation would alias sub-second
    pairs), so both engines interpolate the same integer grid — Spark
    `percentile(array(...))` ↔ DuckDB quantile_cont, the agg_quantiles
    convention, rounded 4dp. The groupBy is map-side combined and the
    percentile buffers are per-type, bounded by gap cardinality."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        g.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.min("gap_us") / F.lit(1e6), 6).alias("min_s"),
            F.expr("percentile(gap_us, array(0.5D, 0.9D, 0.99D))").alias("_q"),
            F.round(F.max("gap_us") / F.lit(1e6), 6).alias("max_s"),
        )
        .select(
            "event_type",
            "n_gaps",
            "min_s",
            F.round(F.element_at("_q", 1) / F.lit(1e6), 4).alias("p50_s"),
            F.round(F.element_at("_q", 2) / F.lit(1e6), 4).alias("p90_s"),
            F.round(F.element_at("_q", 3) / F.lit(1e6), 4).alias("p99_s"),
            "max_s",
        )
        .orderBy("event_type")
    )


EVENTS_INTERARRIVAL_ORACLE = """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events),
f AS (SELECT * FROM g WHERE gap_us IS NOT NULL)
SELECT event_type, count(*) AS n_gaps,
       round(min(gap_us) / 1e6, 6) AS min_s,
       round(quantile_cont(gap_us, 0.5) / 1e6, 4) AS p50_s,
       round(quantile_cont(gap_us, 0.9) / 1e6, 4) AS p90_s,
       round(quantile_cont(gap_us, 0.99) / 1e6, 4) AS p99_s,
       round(max(gap_us) / 1e6, 6) AS max_s
FROM f GROUP BY event_type ORDER BY event_type
"""


def _sparse_und(e: DataFrame) -> DataFrame:
    """Deterministically sparsified undirected interaction graph: the
    canonical (a < b) distinct pairs of _interaction_edges, keeping only
    pairs whose md5("a:b") starts with hex digit '0' (a 1/16 edge
    sample). Salted-md5 decisions are the pipeline_split convention —
    scale-independent, replayable in any engine — and the sparsification
    gives the core/community/link-prediction structure the dense
    next-actor graph lacks (median degree ~86 at sf0.01 collapses every
    peel to all-or-nothing)."""
    und = (
        _interaction_edges(e)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    keep = (
        F.md5(
            F.concat(
                F.col("a").cast("string"), F.lit(":"), F.col("b").cast("string")
            )
        ).substr(1, 1)
        < "1"
    )
    return und.filter(keep)


_GRAPH_SPARSE_PRELUDE = """
ordered AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type
                             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
  FROM events),
dir_edges AS (SELECT src, dst FROM ordered WHERE dst IS NOT NULL AND dst <> src),
und0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dir_edges),
und AS (
  SELECT a, b FROM und0
  WHERE substr(md5(CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 1) < '1'),
adj AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und)"""


def graph_kcore(spark, sf_dir):
    """Bounded-round k-core peeling (k=4, 4 supersteps) over the
    sparsified interaction graph — the standard dense-subgraph /
    spam-farm detector (Seidman 1983; distributed peel à la Montresor et
    al.). Fixed round count makes the superstep sequence SQL-replayable:
    the oracle unrolls the SAME 4 peels, so every intermediate alive-set
    is value-checked, not just a converged fixed point
    (operators/graph.kcore_peel — production swap-in loops the same body
    to convergence). Output: surviving nodes + degree within the
    survivor-induced subgraph."""
    from ..operators import graph as G

    e = _t(spark, sf_dir, "events")
    und = _sparse_und(e)
    return G.kcore_peel(und, "a", "b", k=4, rounds=4).orderBy("node")


def _kcore_oracle(k: int = 4, rounds: int = 4) -> str:
    """Unrolled bounded-round peel (DuckDB forbids aggregates in a
    recursive CTE member — the pagerank-oracle convention)."""
    prev, steps = "a0", []
    for i in range(1, rounds + 1):
        steps.append(
            f"""d{i} AS (
  SELECT adj.u AS node, count(*) AS deg FROM adj
  JOIN {prev} x ON adj.u = x.node JOIN {prev} y ON adj.v = y.node
  GROUP BY adj.u),
a{i} AS (SELECT node FROM d{i} WHERE deg >= {k})"""
        )
        prev = f"a{i}"
    return f"""
WITH {_GRAPH_SPARSE_PRELUDE},
a0 AS (SELECT DISTINCT u AS node FROM adj),
{",".join(steps)},
df AS (
  SELECT adj.u AS node, count(*) AS core_degree FROM adj
  JOIN {prev} x ON adj.u = x.node JOIN {prev} y ON adj.v = y.node
  GROUP BY adj.u)
SELECT node, core_degree FROM df ORDER BY node
"""


GRAPH_KCORE_ORACLE = _kcore_oracle()


def graph_labelprop(spark, sf_dir):
    """Synchronous label-propagation communities (3 supersteps,
    deterministic most-frequent-then-smallest-label rule) over the
    sparsified interaction graph — the near-linear community detector
    (Raghavan et al. 2007) in its oracle-replayable synchronous form
    (operators/graph.label_propagation). The unrolled oracle value-checks
    every node's label after the final superstep, i.e. the full
    propagation history had to match."""
    from ..operators import graph as G

    e = _t(spark, sf_dir, "events")
    und = _sparse_und(e)
    return G.label_propagation(und, "a", "b", iterations=3).orderBy("node")


def _labelprop_oracle(iterations: int = 3) -> str:
    prev, steps = "l0", []
    for i in range(1, iterations + 1):
        steps.append(
            f"""c{i} AS (
  SELECT adj.u, l.label, count(*) AS _c
  FROM adj JOIN {prev} l ON adj.v = l.node GROUP BY adj.u, l.label),
l{i} AS (
  SELECT u AS node, label FROM (
    SELECT u, label,
           row_number() OVER (PARTITION BY u ORDER BY _c DESC, label) AS _rn
    FROM c{i}) WHERE _rn = 1)"""
        )
        prev = f"l{i}"
    return f"""
WITH {_GRAPH_SPARSE_PRELUDE},
l0 AS (SELECT DISTINCT u AS node, u AS label FROM adj),
{",".join(steps)}
SELECT node, label AS community FROM {prev} ORDER BY node
"""


GRAPH_LABELPROP_ORACLE = _labelprop_oracle()


def graph_jaccard_links(spark, sf_dir):
    """Neighborhood-Jaccard link prediction (Liben-Nowell & Kleinberg,
    CIKM 2003): top-50 NON-adjacent pairs of the sparsified interaction
    graph by |N(a)∩N(b)| / |N(a)∪N(b)| — the related-entity /
    suggested-connection primitive (operators/graph.jaccard_links: wedge
    join + degree pass + anti-join against the edge set)."""
    from ..operators import graph as G

    e = _t(spark, sf_dir, "events")
    und = _sparse_und(e)
    return (
        G.jaccard_links(und, "a", "b")
        .orderBy(F.col("jaccard").desc(), "a", "b")
        .limit(50)
    )


GRAPH_JACCARD_LINKS_ORACLE = f"""
WITH {_GRAPH_SPARSE_PRELUDE},
deg AS (SELECT u AS node, count(*) AS deg FROM adj GROUP BY u),
common AS (
  SELECT e1.u AS a, e2.u AS b, count(*) AS n_common
  FROM adj e1 JOIN adj e2 ON e1.v = e2.v AND e1.u < e2.u
  GROUP BY e1.u, e2.u),
nonadj AS (
  SELECT c.* FROM common c
  WHERE NOT EXISTS (SELECT 1 FROM und w WHERE w.a = c.a AND w.b = c.b))
SELECT n.a, n.b, n.n_common, da.deg AS deg_a, db.deg AS deg_b,
       round(n.n_common * 1.0 / (da.deg + db.deg - n.n_common), 6) AS jaccard
FROM nonadj n
JOIN deg da ON n.a = da.node JOIN deg db ON n.b = db.node
ORDER BY jaccard DESC, n.a, n.b LIMIT 50
"""


def graph_modularity(spark, sf_dir):
    """Newman modularity (Newman & Girvan, Phys. Rev. E 69, 2004) of the
    label-propagation communities on the sparsified interaction graph:
    Q = Σ_c [ m_c/m − (d_c/2m)² ] — the standard 'was this community
    structure real' score for graph_labelprop's output (Q near 0 ⇒ no
    better than random). Reuses the deterministic 3-superstep labels, so
    the oracle replays the SAME propagation then the same reduce: two
    label lookups keyed on the edge endpoints (intra-community edge
    count) + one degree-weighted label agg — all slim, node/label-keyed
    shuffles. Output: edge count, community count, intra-edge share, Q."""
    from ..operators import graph as G

    e = _t(spark, sf_dir, "events")
    und = _sparse_und(e)
    labels = G.label_propagation(und, "a", "b", iterations=3)
    la = labels.select(F.col("node").alias("a"), F.col("community").alias("ca"))
    lb = labels.select(F.col("node").alias("b"), F.col("community").alias("cb"))
    tagged = und.join(la, "a").join(lb, "b")
    m = tagged.agg(
        F.count("*").alias("m"),
        F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)).alias("m_in"),
    )
    deg = (
        G._sym_adj(und, "a", "b")
        .groupBy(F.col("u").alias("node"))
        .agg(F.count("*").alias("deg"))
    )
    dc = (
        deg.join(labels, "node")
        .groupBy("community")
        .agg(F.sum("deg").alias("d_c"))
    )
    q = dc.crossJoin(F.broadcast(m)).agg(
        F.min("m").alias("n_edges"),
        F.count("*").alias("n_communities"),
        F.round(F.min("m_in") / F.min("m"), 6).alias("intra_share"),
        F.round(
            F.min("m_in") / F.min("m")
            - F.sum(
                (F.col("d_c") / (2.0 * F.col("m")))
                * (F.col("d_c") / (2.0 * F.col("m")))
            ),
            6,
        ).alias("modularity"),
    )
    return q


def _modularity_oracle(iterations: int = 3) -> str:
    prev, steps = "l0", []
    for i in range(1, iterations + 1):
        steps.append(
            f"""c{i} AS (
  SELECT adj.u, l.label, count(*) AS _c
  FROM adj JOIN {prev} l ON adj.v = l.node GROUP BY adj.u, l.label),
l{i} AS (
  SELECT u AS node, label FROM (
    SELECT u, label,
           row_number() OVER (PARTITION BY u ORDER BY _c DESC, label) AS _rn
    FROM c{i}) WHERE _rn = 1)"""
        )
        prev = f"l{i}"
    return f"""
WITH {_GRAPH_SPARSE_PRELUDE},
l0 AS (SELECT DISTINCT u AS node, u AS label FROM adj),
{",".join(steps)},
edges_m AS (
  SELECT count(*) AS m,
         sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) AS m_in
  FROM und JOIN {prev} la ON und.a = la.node JOIN {prev} lb ON und.b = lb.node),
deg AS (SELECT u AS node, count(*) AS deg FROM adj GROUP BY u),
dc AS (
  SELECT l.label, sum(d.deg) AS d_c
  FROM deg d JOIN {prev} l ON d.node = l.node GROUP BY l.label)
SELECT CAST(min(m) AS BIGINT) AS n_edges, count(*) AS n_communities,
       round(min(m_in) * 1.0 / min(m), 6) AS intra_share,
       round(min(m_in) * 1.0 / min(m)
             - sum((d_c / (2.0 * m)) * (d_c / (2.0 * m))), 6) AS modularity
FROM dc, edges_m
"""


GRAPH_MODULARITY_ORACLE = _modularity_oracle()


def events_ab_srm(spark, sf_dir):
    """Sample-ratio-mismatch check (Fabijan et al., KDD 2019 — the #1
    experimentation-quality gate): does the observed user split across
    the two arms of events_ab_test's parity assignment match the
    designed 50/50 allocation? One-sample chi-square against the
    expected split — a large statistic means the assignment channel is
    broken and the A/B readout must be discarded BEFORE anyone looks at
    the treatment effect. One per-user collapse (the only fact-scale
    shuffle, same key as events_ab_test) + a 1-row reduce of pure
    arithmetic on exact counts."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("_n"))
    arms = per_user.agg(
        F.sum(
            F.when(F.pmod("user_id", F.lit(2)) == 0, 1).otherwise(0)
        ).alias("n_a"),
        F.sum(
            F.when(F.pmod("user_id", F.lit(2)) == 1, 1).otherwise(0)
        ).alias("n_b"),
    )
    n = F.col("n_a") + F.col("n_b")
    exp = n / 2
    chi2 = (F.col("n_a") - exp) * (F.col("n_a") - exp) / exp + (
        F.col("n_b") - exp
    ) * (F.col("n_b") - exp) / exp
    return arms.select(
        "n_a",
        "n_b",
        F.round(F.col("n_a") / n, 6).alias("share_a"),
        F.round(chi2, 6).alias("srm_chi2"),
        (F.round(chi2, 6) > 3.841459).cast("int").alias("srm_flag"),
    )


EVENTS_AB_SRM_ORACLE = """
WITH per_user AS (SELECT user_id, count(*) AS _n FROM events GROUP BY user_id),
arms AS (
  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM per_user)
SELECT n_a, n_b,
       round(n_a * 1.0 / (n_a + n_b), 6) AS share_a,
       round((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
               / ((n_a + n_b) / 2.0)
             + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
               / ((n_a + n_b) / 2.0), 6) AS srm_chi2,
       CAST(round((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
               / ((n_a + n_b) / 2.0)
             + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
               / ((n_a + n_b) / 2.0), 6) > 3.841459 AS INT) AS srm_flag
FROM arms
"""


def events_time_to_convert(spark, sf_dir):
    """Time-to-convert distribution: for every user whose first
    'purchase' FOLLOWS their first 'view', the view→purchase latency in
    hours, summarized as count / mean / interpolated median / p90 — the
    conversion-latency companion to events_funnel's stage counts (the
    funnel says HOW MANY convert, this says HOW FAST). One per-user
    min-aggregate (map-side combined) + a single global quantile
    reduce; no windows, no joins."""
    e = _t(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "fp"
        ),
    )
    # micros difference first (exact integer), THEN /1e6/3600 — the
    # identical float path to the oracle's epoch_us arithmetic
    dt = (F.unix_micros("fp") - F.unix_micros("fv")) / F.lit(1e6) / 3600.0
    conv = per.filter(
        F.col("fv").isNotNull() & F.col("fp").isNotNull() & (dt > 0)
    ).select(dt.alias("hours"))
    return conv.agg(
        F.count("*").alias("n_converters"),
        F.round(F.avg("hours"), 4).alias("mean_hours"),
        F.round(F.median("hours"), 4).alias("median_hours"),
        F.round(F.percentile("hours", F.lit(0.9)), 4).alias("p90_hours"),
    )


EVENTS_TIME_TO_CONVERT_ORACLE = """
WITH per AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events GROUP BY user_id),
conv AS (
  SELECT (epoch_us(fp) - epoch_us(fv)) / 1e6 / 3600.0 AS hours
  FROM per
  WHERE fv IS NOT NULL AND fp IS NOT NULL
    AND (epoch_us(fp) - epoch_us(fv)) / 1e6 / 3600.0 > 0)
SELECT count(*) AS n_converters,
       round(avg(hours), 4) AS mean_hours,
       round(median(hours), 4) AS median_hours,
       round(quantile_cont(hours, 0.9), 4) AS p90_hours
FROM conv
"""


def events_value_deciles(spark, sf_dir):
    """User lifetime-value deciles: rank every user by their total event
    value into 10 NTILE buckets (value desc, user_id tiebreak) and
    profile each decile (users, total value, share of global value,
    mean) — the concentration table behind 'top 10% of users drive X%'
    product analytics. One per-user aggregate, one ntile window over the
    user-level table (users ≪ events), one 10-row reduce with the
    global total broadcast back."""
    e = _t(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(F.sum("value").alias("v"))
    w = W.orderBy(F.col("v").desc(), "user_id")
    dec = per.withColumn("decile", F.ntile(10).over(w))
    tot = per.agg(F.sum("v").alias("tot"))
    return (
        dec.groupBy("decile")
        .agg(F.count("*").alias("n_users"), F.sum("v").alias("_sv"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            F.round(F.col("_sv"), 4).alias("sum_value"),
            F.round(F.col("_sv") / F.col("tot"), 6).alias("value_share"),
            F.round(F.col("_sv") / F.col("n_users"), 4).alias("mean_value"),
        )
        .orderBy("decile")
    )


EVENTS_VALUE_DECILES_ORACLE = """
WITH per AS (SELECT user_id, sum(value) AS v FROM events GROUP BY user_id),
dec AS (
  SELECT v, ntile(10) OVER (ORDER BY v DESC, user_id) AS decile FROM per),
tot AS (SELECT sum(v) AS tot FROM per)
SELECT decile, count(*) AS n_users,
       round(sum(v), 4) AS sum_value,
       round(sum(v) / min(tot.tot), 6) AS value_share,
       round(sum(v) / count(*), 4) AS mean_value
FROM dec, tot GROUP BY decile ORDER BY decile
"""


def events_rolling_median(spark, sf_dir):
    """Rolling MEDIAN over the trailing 7 daily ROWS per event type —
    the robust smoother dashboards use where a rolling mean would chase
    spikes (events_ewma's outlier-immune sibling).

    Frame semantics (VERDICT r5 what's-wrong #3, made explicit): the
    window is ROWS BETWEEN 6 PRECEDING AND CURRENT ROW over the
    day-grain table, i.e. the last 7 OBSERVED days for that type. On a
    gap-free series that equals calendar trailing-7-days; on a
    day-gapped series the frame reaches further back in calendar time
    (absent days contribute no row). The oracle uses the identical ROWS
    frame, so cross-engine equality holds either way; a calendar-true
    variant would gap-fill first (events_gapfill) or use a RANGE frame
    over day-epoch.

    Spark has no ordered-set aggregate over a window frame, so the exact
    interpolated median is composed from primitives:
    sort_array(collect_list(...)) over the ROWS frame + closed-form
    middle-element interpolation — bounded state (≤7 day-level values
    per row; the window runs on the day-grain table, never on facts).
    Matches DuckDB's native median-over-frame bit-for-bit (both are
    quantile_cont(0.5) on ≤7 exact integers)."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    arr = F.sort_array(F.collect_list(F.col("n").cast("double")).over(w))
    sz = F.size(arr)
    mid_hi = F.element_at(arr, (sz / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, F.greatest((sz / 2).cast("int"), F.lit(1)))
    med = F.when(sz % 2 == 1, F.element_at(arr, ((sz + 1) / 2).cast("int"))).otherwise(
        (mid_lo + mid_hi) / 2.0
    )
    return (
        daily.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(med, 4).alias("rolling_median_7d"),
        )
        .orderBy("event_type", "day")
    )


# NOTE: same ROWS-frame semantics as the Spark side — trailing 7
# OBSERVED daily rows, not calendar days (gap days are absent in both).
EVENTS_ROLLING_MEDIAN_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
       round(median(CAST(n AS DOUBLE)) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS rolling_median_7d
FROM daily ORDER BY event_type, day
"""


def events_changepoint(spark, sf_dir):
    """CUSUM change-point detection (Page, Biometrika 1954) on the daily
    event-count series per type: S_t = Σ_{i≤t}(x_i − x̄); the day where
    |S_t| peaks is the maximum-likelihood single mean-shift location —
    the 'when did traffic change' primitive behind monitoring and drift
    attribution, complementing events_anomaly's pointwise z-scores with
    a LOCATION estimate. One daily rollup shuffle, a per-type mean
    broadcast back (5 rows), one cumulative window per type over the
    day-level series (≤ O(days) rows per task — safe at any event
    volume), then an argmax via row_number. Rounded 4dp."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").alias("n")
    )
    mu = daily.groupBy("event_type").agg(F.avg("n").alias("mu"))
    w_cum = W.partitionBy("event_type").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cusum = (
        daily.join(F.broadcast(mu), "event_type")
        .withColumn("s", F.sum(F.col("n") - F.col("mu")).over(w_cum))
    )
    w_rank = W.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), "day"
    )
    return (
        cusum.withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("change_day"),
            F.col("n").alias("n_on_day"),
            F.round(F.col("mu"), 4).alias("daily_mean"),
            F.round(F.col("s"), 4).alias("cusum_peak"),
        )
        .orderBy("event_type")
    )


EVENTS_CHANGEPOINT_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
mu AS (SELECT event_type, avg(n) AS mu FROM daily GROUP BY event_type),
cusum AS (
  SELECT d.event_type, d.day, d.n, m.mu,
         sum(d.n - m.mu) OVER (PARTITION BY d.event_type ORDER BY d.day
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM daily d JOIN mu m ON d.event_type = m.event_type),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(s) DESC, day) AS _rn
  FROM cusum)
SELECT event_type, strftime(day, '%Y-%m-%d') AS change_day,
       n AS n_on_day, round(mu, 4) AS daily_mean, round(s, 4) AS cusum_peak
FROM ranked WHERE _rn = 1 ORDER BY event_type
"""


def events_seasonality(spark, sf_dir):
    """Day-of-week seasonality decomposition per event type: how much of
    the daily-count variance does the weekly profile explain? R² = 1 −
    var(residual)/var(daily) where the fit is the per-(type, dow) mean —
    the one-number 'is this series weekly-periodic' gate run before
    choosing a forecast baseline (cf. events_forecast_naive). Daily
    rollup → 35-row (type, dow) mean broadcast back → one variance
    aggregate per type. All group-keyed, no windows."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").alias("n")
    )
    dow = F.dayofweek("day").alias("dow")
    prof = daily.select("event_type", dow, "n").groupBy(
        "event_type", "dow"
    ).agg(F.avg("n").alias("dow_mean"))
    joined = daily.select("event_type", dow, "day", "n").join(
        F.broadcast(prof), ["event_type", "dow"]
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.var_samp("n"), 4).alias("var_daily"),
            F.round(F.var_samp(F.col("n") - F.col("dow_mean")), 4).alias(
                "var_residual"
            ),
            # constant daily counts (var 0) read NULL r2, not an ANSI
            # DIVIDE_BY_ZERO — seasonality of a flat series is undefined
            F.round(
                1
                - F.var_samp(F.col("n") - F.col("dow_mean"))
                / F.nullif(F.var_samp("n"), F.lit(0.0)),
                6,
            ).alias("dow_r2"),
        )
        .orderBy("event_type")
    )


EVENTS_SEASONALITY_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
d2 AS (SELECT event_type, dayofweek(day) + 1 AS dow, day, n FROM daily),
prof AS (
  SELECT event_type, dow, avg(n) AS dow_mean
  FROM d2 GROUP BY event_type, dow)
SELECT a.event_type, count(*) AS n_days,
       round(var_samp(a.n), 4) AS var_daily,
       round(var_samp(a.n - p.dow_mean), 4) AS var_residual,
       round(1 - var_samp(a.n - p.dow_mean) / nullif(var_samp(a.n), 0), 6) AS dow_r2
FROM d2 a JOIN prof p ON a.event_type = p.event_type AND a.dow = p.dow
GROUP BY a.event_type ORDER BY a.event_type
"""


def graph_reciprocity(spark, sf_dir):
    """Reciprocity of the DIRECTED interaction graph: the share of
    distinct directed edges whose reverse edge also exists (Newman,
    'Networks', §7.10) — the mutual-interaction signal that separates
    conversational structure from broadcast structure; the directed
    complement of the undirected operators (which collapse direction
    away). One distinct over 16-byte pairs + one self-semi-join on the
    reversed key — no fan-out anywhere."""
    e = _t(spark, sf_dir, "events")
    d = _interaction_edges(e).distinct()
    rev = d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = d.join(rev, ["src", "dst"], "left_semi")
    return d.agg(F.count("*").alias("n_edges")).crossJoin(
        F.broadcast(recip.agg(F.count("*").alias("n_recip")))
    ).select(
        "n_edges",
        "n_recip",
        F.round(
            F.col("n_recip") / F.nullif(F.col("n_edges").cast("double"), F.lit(0.0)),
            6,
        ).alias("reciprocity"),
    )


GRAPH_RECIPROCITY_ORACLE = """
WITH ordered AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type
                             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
  FROM events),
d AS (SELECT DISTINCT src, dst FROM ordered
      WHERE dst IS NOT NULL AND dst <> src),
recip AS (
  SELECT count(*) AS n_recip FROM d
  WHERE EXISTS (SELECT 1 FROM d r WHERE r.src = d.dst AND r.dst = d.src)),
tot AS (SELECT count(*) AS n_edges FROM d)
SELECT n_edges, n_recip,
       round(n_recip * 1.0 / nullif(n_edges, 0), 6) AS reciprocity
FROM tot, recip
"""


def graph_clustering(spark, sf_dir):
    """Local clustering coefficient (Watts & Strogatz, Nature 1998) per
    node of the interaction graph: the fraction of a node's neighbor
    pairs that are themselves adjacent — graph_triangles' normalized
    per-node companion and the standard small-world / dense-community
    profile. Top-100 by coefficient (degree, then node id tiebreaks);
    operators/graph.clustering_coefficients (wedge+probe triangle joins
    + one simple-degree pass, triangle-free nodes report 0)."""
    from ..operators import graph as G

    e = _t(spark, sf_dir, "events")
    return (
        G.clustering_coefficients(_interaction_edges(e), "src", "dst")
        .orderBy(F.col("local_cc").desc(), F.col("degree").desc(), "node")
        .limit(100)
    )


GRAPH_CLUSTERING_ORACLE = """
WITH ordered AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type
                             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
  FROM events),
dir_edges AS (SELECT src, dst FROM ordered WHERE dst IS NOT NULL AND dst <> src),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM dir_edges WHERE src <> dst),
adj AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und),
deg AS (
  SELECT u AS node, count(*) AS degree FROM adj GROUP BY u HAVING count(*) >= 2),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
per_node AS (
  SELECT node, count(*) AS n_triangles
  FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node)
SELECT d.node, d.degree, coalesce(t.n_triangles, 0) AS n_triangles,
       round(coalesce(t.n_triangles, 0) * 2.0 / (d.degree * (d.degree - 1)), 6)
         AS local_cc
FROM deg d LEFT JOIN per_node t ON d.node = t.node
ORDER BY local_cc DESC, d.degree DESC, d.node LIMIT 100
"""


def events_forecast_naive(spark, sf_dir):
    """Seasonal-naive forecast backtest per event type: predict each
    day's event count with the count from SEVEN DAYS EARLIER (the
    classic weekly-seasonality baseline every real forecaster must
    beat — Hyndman & Athanasopoulos, 'Forecasting: Principles and
    Practice', the naive-seasonal benchmark) and score MAE / MAPE /
    bias over all scoreable days. A self-join on (event_type, day-7)
    rather than a lag window so calendar GAPS never misalign the
    seasonal reference. One daily-rollup shuffle + one slim keyed
    equi-join of two day-level tables."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    past = daily.select(
        F.date_add("day", 7).alias("day"),
        "event_type",
        F.col("n").alias("pred"),
    )
    scored = daily.join(past, ["day", "event_type"])
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.avg(F.abs(F.col("n") - F.col("pred"))), 4).alias("mae"),
            F.round(
                F.avg(F.abs(F.col("n") - F.col("pred")) / F.col("n")), 6
            ).alias("mape"),
            F.round(F.avg(F.col("pred") - F.col("n")), 4).alias("bias"),
        )
        .orderBy("event_type")
    )


EVENTS_FORECAST_NAIVE_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
scored AS (
  SELECT a.event_type, a.n, p.n AS pred
  FROM daily a JOIN daily p
    ON a.event_type = p.event_type AND p.day = a.day - INTERVAL 7 DAY)
SELECT event_type, count(*) AS n_days,
       round(avg(abs(n - pred)), 4) AS mae,
       round(avg(abs(n - pred) * 1.0 / n), 6) AS mape,
       round(avg(pred - n), 4) AS bias
FROM scored GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "events_hourly": events_hourly,
    "events_ewma": events_ewma,
    "events_attribution": events_attribution,
    "events_funnel": events_funnel,
    "events_anomaly": events_anomaly,
    "events_cum_users": events_cum_users,
    "events_session_window": events_session_window,
    "events_ohlc": events_ohlc,
    "streaming_enrich": streaming_enrich,
    "streaming_join": streaming_join,
    "streaming_session_close": streaming_session_close,
    "events_asof_join": events_asof_join,
    "events_asof_tolerance": events_asof_tolerance,
    "events_range_join": events_range_join,
    "streaming_sessionize": streaming_sessionize,
    "streaming_dedup": streaming_dedup,
    "events_gapfill": events_gapfill,
    "events_trailing_window": events_trailing_window,
    "events_retention": events_retention,
    "events_json": events_json,
    "fn_json_typed": fn_json_typed,
    "events_sessionize": events_sessionize,
    "events_topk_users": events_topk_users,
    "events_type_share": events_type_share,
    "events_paths": events_paths,
    "streaming_tumbling": streaming_tumbling,
    "streaming_sliding": streaming_sliding,
    "streaming_cdc_upsert": streaming_cdc_upsert,
    "graph_bfs": graph_bfs,
    "events_markov": events_markov,
    "events_interarrival": events_interarrival,
    "events_cohort_matrix": events_cohort_matrix,
    "graph_assortativity": graph_assortativity,
    "events_heatmap": events_heatmap,
    "graph_pagerank": graph_pagerank,
    "graph_degree": graph_degree,
    "graph_triangles": graph_triangles,
    "graph_components": graph_components,
    "graph_components_twophase": graph_components_twophase,
    "graph_kcore": graph_kcore,
    "graph_labelprop": graph_labelprop,
    "graph_jaccard_links": graph_jaccard_links,
    "graph_clustering": graph_clustering,
    "events_forecast_naive": events_forecast_naive,
    "graph_modularity": graph_modularity,
    "graph_reciprocity": graph_reciprocity,
    "graph_ppr": graph_ppr,
    "events_changepoint": events_changepoint,
    "events_ab_srm": events_ab_srm,
    "events_rolling_median": events_rolling_median,
    "events_time_to_convert": events_time_to_convert,
    "events_value_deciles": events_value_deciles,
    "events_seasonality": events_seasonality,
    "events_ab_test": events_ab_test,
    "events_streaks": events_streaks,
    "events_wau_mau": events_wau_mau,
}

ORACLES = {
    "events_hourly": EVENTS_HOURLY_ORACLE,
    "events_ewma": EVENTS_EWMA_ORACLE,
    "events_attribution": EVENTS_ATTRIBUTION_ORACLE,
    "events_funnel": EVENTS_FUNNEL_ORACLE,
    "events_anomaly": EVENTS_ANOMALY_ORACLE,
    "events_cum_users": EVENTS_CUM_USERS_ORACLE,
    "events_session_window": EVENTS_SESSION_WINDOW_ORACLE,
    "events_ohlc": EVENTS_OHLC_ORACLE,
    "streaming_enrich": STREAMING_ENRICH_ORACLE,
    "streaming_join": STREAMING_JOIN_ORACLE,
    "streaming_session_close": STREAMING_SESSION_CLOSE_ORACLE,
    "events_asof_join": EVENTS_ASOF_ORACLE,
    "events_asof_tolerance": EVENTS_ASOF_TOLERANCE_ORACLE,
    "events_range_join": EVENTS_RANGE_JOIN_ORACLE,
    "streaming_sessionize": EVENTS_SESSIONIZE_ORACLE,
    "streaming_dedup": STREAMING_DEDUP_ORACLE,
    "events_gapfill": EVENTS_GAPFILL_ORACLE,
    "events_trailing_window": EVENTS_TRAILING_WINDOW_ORACLE,
    "events_retention": EVENTS_RETENTION_ORACLE,
    "events_json": EVENTS_JSON_ORACLE,
    "fn_json_typed": FN_JSON_TYPED_ORACLE,
    "events_sessionize": EVENTS_SESSIONIZE_ORACLE,
    "events_topk_users": EVENTS_TOPK_ORACLE,
    "events_type_share": EVENTS_TYPE_SHARE_ORACLE,
    "events_paths": EVENTS_PATHS_ORACLE,
    "streaming_tumbling": STREAMING_TUMBLING_ORACLE,
    "streaming_sliding": STREAMING_SLIDING_ORACLE,
    "streaming_cdc_upsert": STREAMING_CDC_UPSERT_ORACLE,
    "graph_bfs": GRAPH_BFS_ORACLE,
    "events_markov": EVENTS_MARKOV_ORACLE,
    "events_interarrival": EVENTS_INTERARRIVAL_ORACLE,
    "events_cohort_matrix": EVENTS_COHORT_MATRIX_ORACLE,
    "graph_assortativity": GRAPH_ASSORTATIVITY_ORACLE,
    "events_heatmap": EVENTS_HEATMAP_ORACLE,
    "graph_pagerank": GRAPH_PAGERANK_ORACLE,
    "graph_degree": GRAPH_DEGREE_ORACLE,
    "graph_triangles": GRAPH_TRIANGLES_ORACLE,
    "graph_components": GRAPH_COMPONENTS_ORACLE,
    "graph_components_twophase": GRAPH_COMPONENTS_ORACLE,
    "graph_kcore": GRAPH_KCORE_ORACLE,
    "graph_labelprop": GRAPH_LABELPROP_ORACLE,
    "graph_jaccard_links": GRAPH_JACCARD_LINKS_ORACLE,
    "graph_clustering": GRAPH_CLUSTERING_ORACLE,
    "events_forecast_naive": EVENTS_FORECAST_NAIVE_ORACLE,
    "graph_modularity": GRAPH_MODULARITY_ORACLE,
    "graph_reciprocity": GRAPH_RECIPROCITY_ORACLE,
    "graph_ppr": GRAPH_PPR_ORACLE,
    "events_changepoint": EVENTS_CHANGEPOINT_ORACLE,
    "events_ab_srm": EVENTS_AB_SRM_ORACLE,
    "events_rolling_median": EVENTS_ROLLING_MEDIAN_ORACLE,
    "events_time_to_convert": EVENTS_TIME_TO_CONVERT_ORACLE,
    "events_value_deciles": EVENTS_VALUE_DECILES_ORACLE,
    "events_seasonality": EVENTS_SEASONALITY_ORACLE,
    "events_ab_test": EVENTS_AB_TEST_ORACLE,
    "events_streaks": EVENTS_STREAKS_ORACLE,
    "events_wau_mau": EVENTS_WAU_MAU_ORACLE,
}
