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
