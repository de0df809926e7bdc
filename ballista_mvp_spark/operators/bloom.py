"""DataFrame-native Bloom filter — membership prefilter for incremental
pipelines (batch-vs-corpus dedup, decontamination probes) when the
corpus key set is too large to broadcast exactly.

Spark's built-in bloom machinery is either internal (`bloom_filter_agg`
is not on the public function search path) or driver-only
(`df.stat.bloomFilter` returns an object a column expression cannot
probe without a row-at-a-time UDF). This one composes from public
DataFrame ops:

- BUILD: k seeded xxhash64 positions per key, exploded and
  DISTINCT-folded — the shuffle is bounded by m (the bit-array size),
  NOT the corpus: once every bucket is hit the distinct set cannot
  grow. The collected positions (≤ m ints, e.g. 2^20 bits = at most
  1M ints ≈ 8 MB driver-side worst case, far under broadcast budgets)
  fold into m/64 longs shipped as ONE array literal.
- PROBE: pure JVM bit arithmetic (element_at + shiftright + bit-and)
  per hash — codegen'd, zero shuffle, zero Python.

Guarantees: no false negatives (standard Bloom property — asserted in
tests); false-positive rate ~ (1 - e^{-kn/m})^k, the caller sizes m
for the corpus. At 10¹⁰ keys use m = 2^34 bits (2 GiB) sharded by key
range — the same build shape per shard; locally m defaults small."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits)) for i in range(k)]


def bloom_build(df: DataFrame, key: Column, m_bits: int = 1 << 17, k: int = 5) -> list[int]:
    """Fold a key column into an m_bits Bloom filter; returns the bit
    array as m_bits/64 Python ints (ship with bloom_might_contain)."""
    assert m_bits % 64 == 0
    pos = (
        df.select(F.explode(F.array(*_positions(key, m_bits, k))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos:
        p = r["p"]
        words[p >> 6] |= 1 << (p & 63)
    # to signed 64-bit for the Spark long literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(key: Column, words: list[int], m_bits: int, k: int = 5) -> Column:
    """True iff every one of the key's k bit positions is set — JVM-only
    expression over the broadcast word-array literal. The literal is
    pinned to array<bigint>: when every stored word happens to fit in
    32 bits the inferred literal type is array<int>, whose getbit
    rejects positions >= 32 (caught by the hypothesis no-false-negative
    property)."""
    arr = F.lit(words).cast("array<bigint>")
    checks = []
    for p in _positions(key, m_bits, k):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        # getbit accepts a COLUMN position (shiftright's amount must be a
        # Python int in the classic API, so it can't express this)
        checks.append(F.getbit(word, p % 64) == 1)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_prefilter_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Incremental exact-dedup with a Bloom prefilter: the corpus folds
    to a Bloom over normalized-text fingerprints; the batch keeps only
    rows whose fingerprint MIGHT be in the corpus for the exact verify
    join, everything else short-circuits as new. Returns the batch with
    `bloom_hit` (prefilter verdict) and `is_dup` (exact verdict) — the
    exact join's input shrinks from |batch| to |hits|, the entire point
    at 10¹⁰-key corpora where the exact key set cannot broadcast."""
    from .text import fingerprint

    fp = fingerprint(F.col(text_col))
    words = bloom_build(corpus, fingerprint(F.col(text_col)), m_bits, k)
    b = batch.select(F.col(id_col).alias("batch_id"), fp.alias("_fp")).withColumn(
        "bloom_hit", bloom_might_contain(F.col("_fp"), words, m_bits, k)
    )
    corpus_keys = corpus.select(fingerprint(F.col(text_col)).alias("_fp")).distinct()
    verified = (
        b.filter("bloom_hit")
        .join(corpus_keys.withColumn("_dup", F.lit(True)), "_fp", "left")
        .select("batch_id", F.coalesce("_dup", F.lit(False)).alias("is_dup"))
    )
    return (
        b.select("batch_id", "bloom_hit")
        .join(verified, "batch_id", "left")
        .select(
            "batch_id",
            "bloom_hit",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )
