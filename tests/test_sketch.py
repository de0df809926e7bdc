"""Count-min sketch guarantees: never under-counts, exact below
capacity, merge equals direct build."""

from __future__ import annotations

from pyspark.sql import functions as F

from ballista_mvp_spark.operators import sketch as SK
from ballista_mvp_spark.tables import load_table

from .conftest import SF_SMALL


def _occurrences(spark, counts: dict[str, int]):
    rows = [(t,) for t, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, ["term"])


def test_cms_never_undercounts_and_exact_below_capacity(spark):
    counts = {f"t{i}": (i % 7) + 1 for i in range(50)}
    occ = _occurrences(spark, counts)
    cms = SK.cms_build(occ, "term", depth=4, width=8192)
    items = spark.createDataFrame([(t,) for t in counts], ["term"])
    est = {r.term: r.est for r in SK.cms_estimate(cms, items, "term", 4, 8192).collect()}
    # 50 distinct items in a 4x8192 sketch: collisions in all 4 rows are
    # effectively impossible -> exact; >= holds unconditionally
    for t, n in counts.items():
        assert est[t] == n, (t, est[t], n)


def test_cms_overestimates_under_collision_pressure(spark):
    counts = {f"t{i}": 2 for i in range(64)}
    occ = _occurrences(spark, counts)
    # width=4: heavy collisions guaranteed
    cms = SK.cms_build(occ, "term", depth=2, width=4)
    items = spark.createDataFrame([(t,) for t in counts], ["term"])
    est = {r.term: r.est for r in SK.cms_estimate(cms, items, "term", 2, 4).collect()}
    assert all(est[t] >= 2 for t in counts)
    assert any(est[t] > 2 for t in counts)  # pressure must show


def test_cms_absent_item_estimates_zero_below_capacity(spark):
    occ = _occurrences(spark, {"present": 5})
    cms = SK.cms_build(occ, "term", depth=4, width=8192)
    items = spark.createDataFrame([("absent-xyz",)], ["term"])
    [r] = SK.cms_estimate(cms, items, "term", 4, 8192).collect()
    assert r.est == 0


def test_cms_merge_equals_direct(spark):
    a = _occurrences(spark, {"x": 3, "y": 1})
    b = _occurrences(spark, {"y": 2, "z": 4})
    merged = SK.cms_merge(
        SK.cms_build(a, "term", 4, 1024), SK.cms_build(b, "term", 4, 1024)
    )
    direct = SK.cms_build(a.unionByName(b), "term", 4, 1024)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}
    items = spark.createDataFrame([("x",), ("y",), ("z",)], ["term"])
    est = {r.term: r.est for r in SK.cms_estimate(merged, items, "term", 4, 1024).collect()}
    assert est == {"x": 3, "y": 3, "z": 4}


def test_hll_windowed_trailing_estimates_within_5pct(spark):
    """Every trailing-6h sketch-union estimate must be within 5% of the
    exact trailing distinct count computed from the raw events."""
    from ballista_mvp_spark.queries.extensions import sketch_hll_windowed
    from pyspark.sql import Window as W

    got = {
        r.hour: r.trailing6h_users
        for r in sketch_hll_windowed(spark, SF_SMALL).collect()
    }
    e = load_table(spark, SF_SMALL, "events")
    hours = e.select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "user_id",
    ).distinct()
    # exact trailing distinct: self-join each hour to its 5 predecessors
    hs = sorted({r.hour for r in hours.select("hour").distinct().collect()})
    pairs = [(h, h2) for i, h in enumerate(hs) for h2 in hs[max(0, i - 5): i + 1]]
    pdf = spark.createDataFrame(pairs, "hour string, member string")
    exact = {
        r.hour: r.n
        for r in pdf.join(hours.withColumnRenamed("hour", "member"), "member")
        .groupBy("hour")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for h in exact:
        err = abs(got[h] - exact[h]) / max(exact[h], 1)
        assert err < 0.05, (h, got[h], exact[h])
