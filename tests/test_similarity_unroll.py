"""Bit-equality of the r11 unrolled fixed-dim vector kernels vs the
higher-order-function forms (operators/similarity.dot/norm/cosine with and
without `dim`).

The optimization contract is exact value identity — same left fold from
0.0, same type promotions — so every oracle hash is unchanged. These
tests pin that contract on the real embedding corpus (float arrays cast
and uncast) plus the documented edge cases: zero vectors (the d==0
branch) and NULL vectors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_mvp_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _pairs(df, cast):
    v = F.col("embedding").cast("array<double>") if cast else F.col("embedding")
    a = df.select(F.col("vec_id").alias("a"), v.alias("va"))
    b = df.select(F.col("vec_id").alias("b"), v.alias("vb"))
    return a.crossJoin(F.broadcast(b)).filter(F.col("a") < F.col("b"))


@pytest.mark.parametrize("cast", [True, False], ids=["double", "float"])
def test_cosine_unrolled_bit_equal_on_corpus(emb, cast):
    j = _pairs(emb.limit(80), cast)
    hof = j.select("a", "b", S.cosine(F.col("va"), F.col("vb")).alias("c"))
    unr = j.select("a", "b", S.cosine(F.col("va"), F.col("vb"), 64).alias("c"))
    rows_h = {(r.a, r.b): r.c for r in hof.collect()}
    rows_u = {(r.a, r.b): r.c for r in unr.collect()}
    assert rows_h == rows_u  # exact ==, not approx: the contract is bit-equality


def test_dot_norm_unrolled_bit_equal(emb):
    v = emb.limit(50).select(F.col("embedding").cast("array<double>").alias("v"))
    both = v.select(
        S.dot(F.col("v"), F.col("v")).alias("d_hof"),
        S.dot(F.col("v"), F.col("v"), 64).alias("d_unr"),
        S.norm(F.col("v")).alias("n_hof"),
        S.norm(F.col("v"), 64).alias("n_unr"),
    )
    for r in both.collect():
        assert r.d_hof == r.d_unr
        assert r.n_hof == r.n_unr


def test_cosine_unrolled_zero_and_null_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 4, [1.0, 2.0, 3.0, 4.0]),   # zero-magnitude -> 0.0 branch
         (2, [1.0] * 4, None)],                   # NULL vector
        "id long, a array<double>, b array<double>",
    )
    out = df.select(
        S.cosine(F.col("a"), F.col("b")).alias("hof"),
        S.cosine(F.col("a"), F.col("b"), 4).alias("unr"),
    ).collect()
    assert out[0].hof == 0.0 and out[0].unr == 0.0
    # NULL vector: d = norm(a)*NULL = NULL, `when(NULL != 0)` is falsy →
    # both forms fall to the otherwise(0.0) branch identically
    assert out[1].hof == 0.0 and out[1].unr == 0.0


def test_text_rendered_unroll_matches_column_fallback(emb):
    # r11: plain-named columns render the unrolled kernel as ONE SQL
    # parse (~450 py4j calls saved per call site); a non-identifier
    # column name forces the Column-composition fallback. Both must be
    # bit-equal — and the canonicalized analyzed plans identical.
    v = F.col("embedding").cast("array<double>")
    a = emb.limit(60).select(F.col("vec_id").alias("a"), v.alias("va"))
    b = emb.limit(60).select(F.col("vec_id").alias("b"), v.alias("vb"))
    j = a.crossJoin(F.broadcast(b)).filter(F.col("a") < F.col("b"))
    text = j.select("a", "b", S.cosine(F.col("va"), F.col("vb"), 64).alias("c"))
    j2 = j.withColumnRenamed("va", "va x").withColumnRenamed("vb", "vb x")
    fallback = j2.select(
        "a", "b", S.cosine(F.col("`va x`"), F.col("`vb x`"), 64).alias("c")
    )
    assert S._plain_name(F.col("`va x`")) is None  # the gate really fell back
    rows_t = {(r.a, r.b): r.c for r in text.collect()}
    rows_f = {(r.a, r.b): r.c for r in fallback.collect()}
    assert rows_t == rows_f
    # same-named frames: text form and hand-built Column form must
    # analyze to the SAME canonical plan (equivalence by construction)
    e = F.lit(0.0)
    for k in range(64):
        e = e + F.get(F.col("va"), k) * F.get(F.col("vb"), k)
    na = F.lit(0.0)
    for k in range(64):
        x = F.get(F.col("va"), k)
        na = na + x * x
    nb = F.lit(0.0)
    for k in range(64):
        x = F.get(F.col("vb"), k)
        nb = nb + x * x
    d = F.sqrt(na) * F.sqrt(nb)
    manual = j.select(
        "a", "b", F.when(d != 0, e / d).otherwise(F.lit(0.0)).alias("c")
    )
    pt = text._jdf.queryExecution().analyzed().canonicalized().toString()
    pm = manual._jdf.queryExecution().analyzed().canonicalized().toString()
    assert pt == pm


def test_spread_refuses_shuffling_input(spark):
    """r12 (VERDICT r11 #4): spread_small_scan's scan-shaped-input
    contract is mechanical — a shuffling/derived plan is returned
    UNCHANGED (identity, so no `.rdd` probe and no hidden AQE stage
    materialization), while a small scan-shaped input still gets the
    round-robin spread."""
    from pyspark.sql import functions as F

    from ballista_mvp_spark.operators.similarity import (
        _scan_shaped,
        spread_small_scan,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # scan-shaped inputs: scan, projected/filtered/aliased scan
    scanish = emb.select("vec_id", "embedding").filter(F.col("vec_id") >= 0)
    assert _scan_shaped(emb) and _scan_shaped(scanish.alias("s"))
    spread = spread_small_scan(scanish)
    assert spread is not scanish  # the spread happened (tiny scan)
    assert "Repartition" in spread._jdf.queryExecution().analyzed().treeString()
    # shuffling shapes: aggregate, window-sample, join, repartition
    agg = emb.groupBy("vec_id").count()
    win = emb.withColumn(
        "_r",
        F.row_number().over(
            __import__("pyspark.sql", fromlist=["Window"]).Window.orderBy("vec_id")
        ),
    )
    joined = emb.join(emb.select(F.col("vec_id").alias("_q")), F.col("vec_id") == F.col("_q"))
    for bad in (agg, win, joined, emb.repartition(2), emb.limit(5)):
        assert not _scan_shaped(bad)
        assert spread_small_scan(bad) is bad  # identity no-op, no probe


def test_cosine_from_norms_bit_equal_on_corpus(emb, spark):
    """r12: the pre-join-norm form (cosine_from_norms + eject seed —
    the empty-array fold IS 0.0D) must be bit-equal to the inline
    cosine, text path AND Column-fallback path, including the zero-
    vector d==0 branch."""
    df = emb.limit(80).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    zero = spark.createDataFrame(
        [(9001, [0.0] * 64), (9002, [1.0] + [0.0] * 63)],
        "vec_id long, embedding array<double>",
    )
    df = df.unionByName(zero)
    a = df.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("va"),
        S.norm(F.col("embedding"), 64).alias("_na"),
    )
    b = df.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("vb"),
        S.norm(F.col("embedding"), 64).alias("_nb"),
    )
    j = a.crossJoin(F.broadcast(b)).filter(F.col("a") < F.col("b"))
    inline = j.select("a", "b", S.cosine(F.col("va"), F.col("vb"), 64).alias("c"))
    # text path: all four args plain column refs
    pre = j.select(
        "a", "b",
        S.cosine_from_norms(
            F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb"), 64
        ).alias("c"),
    )
    # Column-fallback path: a non-plain-name arg (_na * 1.0 is an IEEE
    # identity) forces the Column-composition branch
    pre_fb = j.select(
        "a", "b",
        S.cosine_from_norms(
            F.col("va"),
            F.col("vb"),
            F.col("_na") * F.lit(1.0),
            F.col("_nb"),
            64,
        ).alias("c"),
    )
    rows_i = {(r.a, r.b): r.c for r in inline.collect()}
    rows_p = {(r.a, r.b): r.c for r in pre.collect()}
    rows_f = {(r.a, r.b): r.c for r in pre_fb.collect()}
    assert rows_i == rows_p  # exact ==: bit-equality contract
    assert rows_i == rows_f  # _na*1.0 is IEEE-identity; fallback path pinned
