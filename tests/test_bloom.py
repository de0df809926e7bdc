"""DataFrame-native Bloom filter (operators/bloom.py): no false
negatives, bounded false-positive rate, and the prefiltered incremental
dedup agrees exactly with the unfiltered join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ballista_mvp_spark.operators import bloom as B
from ballista_mvp_spark.tables import load_table

from .conftest import SF_SMALL


def test_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(0, 2000).select(F.concat(F.lit("key-"), "id").alias("k"))
    words = B.bloom_build(members, F.col("k"), m_bits=1 << 16, k=5)
    probe = spark.range(0, 4000).select(
        "id", F.concat(F.lit("key-"), "id").alias("k")
    ).withColumn("hit", B.bloom_might_contain(F.col("k"), words, 1 << 16, 5))
    rows = probe.collect()
    misses = [r.id for r in rows if r.id < 2000 and not r.hit]
    assert misses == []  # Bloom property: never a false negative
    fps = sum(1 for r in rows if r.id >= 2000 and r.hit)
    # k=5, n=2000, m=65536 -> theoretical fp ~ 0.04%; allow 50x slack
    assert fps / 2000 < 0.02, fps


def test_prefilter_dedup_matches_exact_join(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(200)
    out = B.bloom_prefilter_dedup(corpus, batch, "doc_id", "text").collect()
    from ballista_mvp_spark.operators.text import fingerprint

    corpus_fps = {
        r[0] for r in corpus.select(fingerprint(F.col("text"))).distinct().collect()
    }
    batch_fps = {
        r.doc_id: r.fp
        for r in batch.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()
    }
    for r in out:
        truth = batch_fps[r.batch_id] in corpus_fps
        assert r.is_dup == truth, (r.batch_id, r.is_dup, truth)
        if truth:
            assert r.bloom_hit  # a real dup can never be bloom-missed

    # the prefilter must actually prune: hits <= batch size, and the
    # exact-join input is only the hit rows
    n_hits = sum(1 for r in out if r.bloom_hit)
    assert n_hits <= len(out)
