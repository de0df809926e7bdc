"""DataFrame-native Bloom filter — membership prefilter for incremental
pipelines (batch-vs-corpus dedup, decontamination probes) when the
corpus key set is too large to broadcast exactly.

Spark's built-in bloom machinery is either internal (`bloom_filter_agg`
is not on the public function search path) or driver-only
(`df.stat.bloomFilter` returns an object a column expression cannot
probe without a row-at-a-time UDF). This one composes from public
DataFrame ops:

- BUILD: k seeded xxhash64 positions per key, exploded and OR-folded
  into words on the executors (groupBy word index + bit_or, map-side
  combined) — the shuffle is bounded by m (the bit-array size), NOT
  the corpus, and the driver collects exactly m/64 longs (2^20 bits =
  16 K longs ≈ 128 KB), shipped as ONE array literal.
- PROBE: pure JVM bit arithmetic (element_at + shiftright + bit-and)
  per hash — codegen'd, zero shuffle, zero Python.

Guarantees: no false negatives (standard Bloom property — asserted in
tests); false-positive rate ~ (1 - e^{-kn/m})^k, the caller sizes m
for the corpus. At 10¹⁰ keys use m = 2^34 bits (2 GiB) sharded by key
range — the same build shape per shard; locally m defaults small."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import nested_double_lit


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits)) for i in range(k)]


def bloom_build(df: DataFrame, key: Column, m_bits: int = 1 << 17, k: int = 5) -> list[int]:
    """Fold a key column into an m_bits Bloom filter; returns the bit
    array as m_bits/64 Python ints (ship with bloom_might_contain).

    The words are OR-folded on the executors (groupBy word index +
    bit_or of the position's bit — map-side combined like any
    aggregate), so the collect is bounded by m/64 LONGS, not by the
    distinct position count: 2^20 bits is 16 K longs ≈ 128 KB of driver
    transfer where the r10 distinct-positions collect moved up to 1 M
    ints ≈ 8 MB (r11 optimization; identical words — bit_or over
    single-bit values is exactly the python |= loop it replaces)."""
    assert m_bits % 64 == 0
    folded = (
        df.select(F.explode(F.array(*_positions(key, m_bits, k))).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("i"),
            F.expr("shiftleft(1L, cast(p % 64 AS int))").alias("b"),
        )
        .groupBy("i")
        .agg(F.bit_or("b").alias("w"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in folded:
        words[r["i"]] = r["w"]
    return words


def bloom_might_contain(key: Column, words: list[int], m_bits: int, k: int = 5) -> Column:
    """True iff every one of the key's k bit positions is set — JVM-only
    expression over the broadcast word-array literal. The literal is
    pinned to array<bigint>: when every stored word happens to fit in
    32 bits the inferred literal type is array<int>, whose getbit
    rejects positions >= 32 (caught by the hypothesis no-false-negative
    property). The word array ships as ONE resolved bigint literal
    (operators/similarity.nested_double_lit — 2048 longs via F.lit was
    ~1 s of per-element py4j construction at every invocation, r11)."""
    arr = nested_double_lit(words, elem_sql_type="bigint")
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
