"""As-of/range join and weighted-percentile operator tests (edge cases
beyond the oracle-checked queries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_mvp_spark.operators.aggregates import weighted_percentile
from ballista_mvp_spark.operators.asof import asof_join, range_join
from ballista_mvp_spark.tables import load_table

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def views(spark):
    e = load_table(spark, SF_SMALL, "events")
    return e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")


def test_asof_empty_right_yields_nulls(spark, views):
    e = load_table(spark, SF_SMALL, "events")
    empty = e.filter(F.col("event_type") == "nope").select(
        "user_id", "ts", F.col("value").alias("v")
    )
    out = asof_join(views, empty, "user_id", "ts", "ts", ["v"]).collect()
    assert len(out) == views.count()
    assert all(r.v is None for r in out)


def test_asof_forward_vs_backward(spark, views):
    e = load_table(spark, SF_SMALL, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("v")
    )
    back = asof_join(views, purchases, "user_id", "ts", "ts", ["v"], "backward")
    fwd = asof_join(views, purchases, "user_id", "ts", "ts", ["v"], "forward")
    assert back.count() == fwd.count() == views.count()
    # forward match must be at-or-after; backward at-or-before → for any
    # user with exactly one purchase, rows matched by both directions agree
    with pytest.raises(ValueError):
        asof_join(views, purchases, "user_id", "ts", "ts", ["v"], "sideways")


def test_range_join_bounds_inclusive(spark):
    df_l = spark.sql("SELECT timestamp'2024-01-01 00:00:00' AS lt, 1 AS k")
    df_r = spark.sql(
        "SELECT * FROM VALUES (timestamp'2024-01-01 00:30:00', 1),"
        " (timestamp'2024-01-01 01:00:00', 1), (timestamp'2024-01-01 01:00:01', 1)"
        " AS t(rt, k)"
    )
    out = range_join(
        df_l, df_r, F.col("lt"), F.col("rt"), 0, 3600, extra_key="k"
    ).collect()
    # 00:30 and exactly 01:00 in range; 01:00:01 out
    assert len(out) == 2


def test_weighted_percentile_hand_case(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 8.0)], "g string, v double, w double"
    )
    # total weight 10; q=0.5 → cum weights 1,2,10 → first ≥5 is v=3
    got = weighted_percentile(df, ["g"], "v", "w", 0.5).head()
    assert got.wpct == 3.0
    # q small → smallest value
    got = weighted_percentile(df, ["g"], "v", "w", 0.05).head()
    assert got.wpct == 1.0


def test_asof_tolerance_on_numeric_epoch_times(spark):
    """tolerance_seconds must work when the time columns are plain
    numerics (epoch seconds) — unix_timestamp() on them is an ANSI type
    error and a silent NULL-killer in non-ANSI mode."""
    from ballista_mvp_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100), (1, 200)], ["k", "t"])
    right = spark.createDataFrame([(1, 95, "a"), (1, 120, "b")], ["k", "rt", "v"])
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        value_cols=["v"], tolerance_seconds=10,
    )
    got = {r.t: r.v for r in out.collect()}
    assert got == {100: "a", 200: None}  # 200's match (120) is 80s away


def test_join_list_keys_with_residual(spark):
    """joins.join with the documented list-of-names `on` form plus a
    residual must build the equi-conditions itself and keep the USING
    output shape (one key column)."""
    import pytest

    from ballista_mvp_spark.operators import joins as J
    from pyspark.sql import functions as F

    l = spark.createDataFrame([(1, 10), (1, 1), (2, 10)], ["k", "x"])
    r = spark.createDataFrame([(1, 5), (2, 50)], ["k", "y"])
    out = J.join(l, r, ["k"], "inner", residual=F.col("x") > F.col("y"))
    assert out.columns == ["k", "x", "y"]
    assert sorted((row.k, row.x, row.y) for row in out.collect()) == [(1, 10, 5)]
    # left join: unmatched left rows survive with nulls
    out_l = J.join(l, r, ["k"], "left", residual=F.col("x") > F.col("y"))
    assert out_l.count() == 3 and out_l.filter("y IS NULL").count() == 2
    # semi: left columns only
    out_s = J.join(l, r, ["k"], "left_semi", residual=F.col("x") > F.col("y"))
    assert out_s.columns == ["k", "x"]
    assert [(row.k, row.x) for row in out_s.collect()] == [(1, 10)]
    # full outer: keys coalesce
    out_f = J.join(l, r, ["k"], "full", residual=F.col("x") > F.col("y"))
    assert set(out_f.select("k").toPandas()["k"]) == {1, 2}
    # right_semi/right_anti reject the inapplicable broadcast pin loudly
    with pytest.raises(ValueError, match="broadcast_right"):
        J.join(l, r, ["k"], "right_semi", broadcast_right=True)


def test_scd2_merge_rejects_duplicate_update_keys(spark):
    """Two update rows for one business key would fan the join out
    (duplicate closed rows + two simultaneous open versions) — the merge
    must refuse the batch instead of silently corrupting history."""
    import pytest
    from pyspark.sql import functions as F

    from ballista_mvp_spark.operators.scd import scd2_merge

    current = spark.createDataFrame(
        [(42, "v0", "2024-01-01", None)],
        "k long, attr string, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [(42, "v1"), (42, "v2")], "k long, attr string"
    )
    with pytest.raises(ValueError, match="multiple rows for key"):
        scd2_merge(current, updates, "k", ["attr"], F.lit("2024-02-01"))
    # a clean batch still merges: v0 closes, v1 opens
    ok = scd2_merge(
        current, updates.filter("attr = 'v1'"), "k", ["attr"], F.lit("2024-02-01")
    )
    rows = {(r.attr, r.valid_to) for r in ok.collect()}
    assert rows == {("v0", "2024-02-01"), ("v1", None)}
