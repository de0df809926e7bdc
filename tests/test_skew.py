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
