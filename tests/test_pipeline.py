"""Behavioral tests for the training-pipeline operators (operators/
pipeline.py + dedup.connected_components). Value-level certification is
the DuckDB oracle (tests/test_oracle_queries.py: pipeline_*, text_tfidf,
text_repetition, text_decontaminate, dedup_clusters); these cover the
invariants an oracle diff can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from ballista_mvp_spark.operators import dedup as D
from ballista_mvp_spark.operators import pipeline as P


def test_hash_split_stable_and_proportional(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = P.hash_split(df, "k").select("k", "bucket", "split")
    frac = {
        r["split"]: r["n"] / 2000
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # 80/10/10 within generous tolerance at n=2000
    assert 0.74 < frac["train"] < 0.86 and 0.06 < frac["val"] < 0.14
    # growing the corpus never reassigns existing ids
    bigger = P.hash_split(spark.range(0, 4000).withColumnRenamed("id", "k"), "k")
    joined = out.join(bigger.select("k", F.col("split").alias("s2")), "k")
    assert joined.filter(F.col("split") != F.col("s2")).count() == 0


def test_pack_sequences_is_a_contiguous_token_stream(spark):
    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 37 + 1).alias("n")
    )
    packed = P.pack_sequences(df, "id", F.col("n"), seq_len=100, chunk=64).orderBy("id")
    rows = packed.collect()
    off = 0
    for r in rows:
        assert r["start_off"] == off, "offsets must tile the stream with no gaps"
        assert r["seq_id"] == off // 100 and r["seq_off"] == off % 100
        off += r["n_tok"]


def test_connected_components_labels_and_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(8)], ["id"])
    # components: {0,1,2,3} (chain), {5,6}, singletons {4}, {7}
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (5, 6)], ["a", "b"])
    comp = {r["id"]: r["comp"] for r in D.connected_components(nodes, edges).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7}


def test_decontaminate_flags_planted_overlap(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        ["id", "text"],
    )
    eval_df = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (11, "totally fresh words nothing shared here at all today friends"),
        ],
        ["id", "text"],
    )
    out = {
        r["id"]: (r["n_contaminated"], r["contaminated"])
        for r in P.decontaminate(train, eval_df, "id", "text", shingle_k=8).collect()
    }
    assert out[10][1] is True and out[10][0] == 3  # 10 tokens -> 3 distinct 8-grams
    assert out[11] == (0, False)
