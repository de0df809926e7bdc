"""Behavioral tests for the training-pipeline operators (operators/
pipeline.py + dedup.connected_components). Value-level certification is
the DuckDB oracle (tests/test_oracle_queries.py: pipeline_*, text_tfidf,
text_repetition, text_decontaminate, dedup_clusters); these cover the
invariants an oracle diff can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_mvp_spark.operators import dedup as D
from ballista_mvp_spark.operators import pipeline as P
from ballista_mvp_spark.operators import text as TX


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


def test_decontaminate_eval_cap_guard(spark):
    """The eval_bounded contract is ENFORCED (ADVICE r9): an eval side
    larger than eval_doc_cap raises an actionable error BEFORE the
    broadcast is attempted; None disables the guard (same output)."""
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        ["id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(i, f"w{i} alpha beta gamma delta epsilon zeta eta theta") for i in range(5)],
        ["id", "text"],
    )
    with pytest.raises(ValueError, match="eval_bounded=False"):
        P.decontaminate(
            train, eval_df, "id", "text", shingle_k=8, eval_doc_cap=3
        ).collect()
    ok = P.decontaminate(
        train, eval_df, "id", "text", shingle_k=8, eval_doc_cap=None
    ).count()
    assert ok == 5


def test_span_dedup_keeps_first_occurrence_only(spark):
    # doc 1 and doc 2 share an identical 5-token span; doc 2's copy must
    # be dropped, doc 1 (smaller id) keeps it. Unique spans all survive.
    df = spark.createDataFrame(
        [
            (1, "a b c d e one two three four five"),
            (2, "a b c d e six seven eight nine ten"),
            (3, "u v w x y z q r s t"),
        ],
        ["id", "text"],
    )
    out = {r["id"]: r for r in D.span_dedup(df, "id", "text", span=5).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["n_dropped"] == 0
    assert out[1]["text_dedup"] == "a b c d e one two three four five"
    assert out[2]["n_spans"] == 2 and out[2]["n_dropped"] == 1
    assert out[2]["text_dedup"] == "six seven eight nine ten"
    assert out[3]["n_dropped"] == 0 and out[3]["text_dedup"] == "u v w x y z q r s t"


def test_stratified_sample_is_deterministic_and_stable_under_growth(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.when(F.col("id") % 2 == 0, "en").otherwise("de")).alias("lang")
    )
    kept1 = {r["id"] for r in P.stratified_sample(df, "id", "lang", {"en": 0.25}).collect()}
    # en downsampled to ~25%, de untouched
    n_en = sum(1 for i in kept1 if i % 2 == 0)
    assert 500 * 0.15 < n_en < 500 * 0.35
    assert sum(1 for i in kept1 if i % 2 == 1) == 500
    # growing the corpus never flips an existing row's membership
    grown = spark.range(0, 2000).select(
        F.col("id"), (F.when(F.col("id") % 2 == 0, "en").otherwise("de")).alias("lang")
    )
    kept2 = {r["id"] for r in P.stratified_sample(grown, "id", "lang", {"en": 0.25}).collect()}
    assert {i for i in kept2 if i < 1000} == kept1


def test_quota_cap_respects_quota_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3), float(i % 7)) for i in range(60)], ["id", "dom", "sc"]
    )
    out = P.quota_cap(df, "id", "dom", F.col("sc"), 5)
    rows = out.collect()
    assert len(rows) == 15
    for dom in ("s0", "s1", "s2"):
        grp = sorted([r for r in rows if r["dom"] == dom], key=lambda r: r["rk"])
        assert [r["rk"] for r in grp] == [1, 2, 3, 4, 5]
        # scores non-increasing; equal scores resolved by ascending id
        for a, b in zip(grp, grp[1:]):
            assert (a["sc"], -a["id"]) >= (b["sc"], -b["id"])


def test_gopher_report_flags(spark):
    good = "the quick brown fox and the lazy dog have to be of use " * 5
    df = spark.createDataFrame(
        [(1, good), (2, "zz " * 60), (3, "### ... ### " * 30)], ["id", "text"]
    )
    bullets = "\n".join(["- item of the list to be had"] * 10)
    dots = "\n".join([f"the sentence {i} trails off with and that..." for i in range(10)])
    df2 = spark.createDataFrame([(4, bullets), (5, dots)], ["id", "text"])
    out = {r["id"]: r for r in TX.gopher_report(df, "id", "text").collect()}
    assert out[1]["keep"] is True
    assert out[1]["f_bullet"] is True and out[1]["f_ellipsis"] is True
    assert out[2]["keep"] is False and out[2]["f_stopwords"] is False
    assert out[3]["keep"] is False and out[3]["f_symbol"] is False
    out2 = {r["id"]: r for r in TX.gopher_report(df2, "id", "text").collect()}
    assert out2[4]["bullet_line_frac"] == 1.0 and out2[4]["f_bullet"] is False
    assert out2[5]["ellipsis_line_frac"] == 1.0 and out2[5]["f_ellipsis"] is False
    assert out2[4]["keep"] is False and out2[5]["keep"] is False


def test_token_budget_sample_is_nested_prefix(spark):
    df = spark.range(0, 300).select(F.col("id"), (F.col("id") % 50 + 1).alias("n"))
    small = P.token_budget_sample(df, "id", F.col("n"), budget=500)
    big = P.token_budget_sample(df, "id", F.col("n"), budget=2000)
    s = {r["id"] for r in small.collect()}
    b = {r["id"] for r in big.collect()}
    assert s and s < b  # nested budgets -> nested subsets
    # every kept row's tokens_before is the exact hash-order prefix sum
    rows = sorted(big.collect(), key=lambda r: r["tokens_before"])
    acc = 0
    for r in rows:
        assert r["tokens_before"] == acc
        acc += r["n_tok"]
    assert all(r["tokens_before"] < 2000 for r in rows)


def test_chunk_documents_overlap_and_tail(spark):
    text10 = " ".join(f"w{i}" for i in range(10))
    text3 = "a b c"
    df = spark.createDataFrame([(1, text10), (2, text3)], ["id", "text"])
    out = P.chunk_documents(df, "id", "text", size=4, stride=3)
    rows = sorted(out.collect(), key=lambda r: (r["id"], r["chunk_id"]))
    d1 = [r for r in rows if r["id"] == 1]
    # 10 tokens, size 4, stride 3 -> ceil((10-4)/3)+1 = 3 chunks
    assert [r["chunk_id"] for r in d1] == [0, 1, 2]
    assert d1[0]["chunk_text"] == "w0 w1 w2 w3"
    assert d1[1]["chunk_text"] == "w3 w4 w5 w6"  # 1-token overlap
    assert d1[2]["chunk_text"] == "w6 w7 w8 w9"
    assert [r["chunk_tokens"] for r in d1] == [4, 4, 4]
    # every token appears in some chunk (no boundary loss)
    covered = set(" ".join(r["chunk_text"] for r in d1).split())
    assert covered == set(text10.split())
    # short doc -> exactly one (possibly partial) chunk
    d2 = [r for r in rows if r["id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "a b c" and d2[0]["chunk_tokens"] == 3


def test_incremental_dedup_all_three_statuses(spark):
    corpus = spark.createDataFrame(
        [(100, "seen before"), (101, "also seen")], ["id", "text"]
    )
    batch = spark.createDataFrame(
        [(1, "seen before"), (2, "brand new"), (3, "brand new"), (4, "unique doc")],
        ["id", "text"],
    )
    out = {
        r["id"]: r
        for r in D.incremental_dedup(
            corpus, batch, F.md5(F.col("text")), "id"
        ).collect()
    }
    assert out[1]["status"] == "dup_corpus" and out[1]["in_corpus"] is True
    assert out[2]["status"] == "new"
    assert out[3]["status"] == "dup_batch"  # min-id 2 survives within batch
    assert out[4]["status"] == "new" and out[4]["in_corpus"] is False
    # survivors = exactly the 'new' rows
    assert {k for k, r in out.items() if r["status"] == "new"} == {2, 4}


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], ["id", "s"]
    )
    out = {r["col_name"]: r for r in P.profile_columns(df, ["id", "s"]).collect()}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_nulls"] == 0
    assert out["id"]["n_distinct"] == 4
    assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "4"
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"


def test_shard_checksum_invariant_under_repartition(spark):
    """The shard manifest's bit_xor checksum must be identical whatever
    the physical partitioning of the input — the property that makes it
    a valid cross-engine/cross-layout integrity artifact."""
    from ballista_mvp_spark.queries.pipeline import pipeline_shard_manifest
    from ballista_mvp_spark.tables import load_table

    from .conftest import SF_SMALL

    base = {tuple(r) for r in pipeline_shard_manifest(spark, SF_SMALL).collect()}

    docs = load_table(spark, SF_SMALL, "documents")
    import ballista_mvp_spark.queries.pipeline as PQ
    from unittest import mock

    for n in (1, 13):
        shuffled = docs.repartition(n)
        with mock.patch.object(PQ, "_t", lambda _s, _d, _n: shuffled):
            got = {tuple(r) for r in pipeline_shard_manifest(spark, SF_SMALL).collect()}
        assert got == base, n


def test_group_split_keeps_planted_duplicates_together(spark):
    """Documents with identical normalized text but different ids must
    land in the SAME split under the fingerprint-keyed assignment
    (whereas the id-keyed split may separate them — the leakage the
    operator exists to prevent)."""
    rows = []
    # 40 distinct texts, each planted as 3 copies with far-apart ids and
    # cosmetic whitespace/case edits that normalize away
    for i in range(40):
        base = f"the quick document number {i} with shared content"
        rows.append((i, base))
        rows.append((1000 + i, base.upper()))
        rows.append((2000 + i, "  " + base.replace(" ", "   ") + " "))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assigned = P.hash_split(
        docs.withColumn("fp", TX.fingerprint(F.col("text"))), "fp"
    )
    per_group = (
        assigned.groupBy("fp")
        .agg(
            F.countDistinct("split").alias("ns"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(per_group) == 40  # normalization really collapses the edits
    assert all(r.n == 3 for r in per_group)
    assert all(r.ns == 1 for r in per_group)  # no group straddles splits


def test_equal_allocation_keeps_min_stratum_whole(spark):
    # strata sized 40/10: the min stratum (de) gets threshold 65536 ->
    # every row survives; en's threshold is exactly (10*65536)//40
    rows = [(i, "en") for i in range(40)] + [(100 + i, "de") for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "lang"])
    kept = P.equal_allocation_sample(df, "id", "lang").collect()
    de = [r for r in kept if r.lang == "de"]
    en = [r for r in kept if r.lang == "en"]
    assert len(de) == 10 and all(r.threshold == 65536 for r in de)
    assert all(r.threshold == (10 * 65536) // 40 for r in en)
    assert all(r.bucket16 < r.threshold for r in kept)


def test_equal_allocation_membership_stable_when_other_stratum_grows(spark):
    # growing en must never flip de survivors (min stratum unchanged)
    rows = [(i, "en") for i in range(40)] + [(100 + i, "de") for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "lang"])
    before = {r.id for r in P.equal_allocation_sample(df, "id", "lang").collect() if r.lang == "de"}
    grown = df.union(spark.createDataFrame([(1000 + i, "en") for i in range(20)], ["id", "lang"]))
    after = {r.id for r in P.equal_allocation_sample(grown, "id", "lang").collect() if r.lang == "de"}
    assert before == after == {100 + i for i in range(10)}


def test_cross_source_catches_planted_mirrors(spark, tmp_path):
    # plant verbatim reprints across sources (including a 3-way mirror)
    # plus whitespace/case variants that must still collapse to one
    # fingerprint cluster
    rows = [
        (1, "the quick brown fox", "en", "srcA", 19),
        (2, "THE  quick   Brown fox", "en", "srcB", 22),   # same after norm
        (3, "the quick brown fox", "en", "srcC", 19),      # 3-way mirror
        (4, "something else entirely", "en", "srcA", 23),
        (5, "something else entirely", "en", "srcA", 23),  # same-source dup: no pair
        (6, "unique text here", "en", "srcB", 16),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    p = str(tmp_path / "documents.parquet")
    df.write.parquet(p)
    from ballista_mvp_spark.queries.pipeline import dedup_cross_source

    got = {
        (r.source_a, r.source_b): r.n_shared_clusters
        for r in dedup_cross_source(spark, str(tmp_path)).collect()
    }
    # the raw cross-source matrix (planted 'mirror' control filtered out):
    # the fox cluster spans A/B/C -> all three pairs, one cluster each;
    # the same-source dup (rows 4,5) must NOT create a pair
    real = {k: v for k, v in got.items() if "mirror" not in k}
    assert real == {("srcA", "srcB"): 1, ("srcA", "srcC"): 1, ("srcB", "srcC"): 1}
    # the planted positive control: 'mirror' republishes every doc (all 6
    # are in the 25-lowest-doc_id slice), so it shares srcA's 2 distinct
    # fingerprints, srcB's 2, srcC's 1 — proof the detector fires even on
    # a corpus with no natural reprints ('mirror' < 'src*' lexically)
    assert {k: v for k, v in got.items() if "mirror" in k} == {
        ("mirror", "srcA"): 2, ("mirror", "srcB"): 2, ("mirror", "srcC"): 1
    }


def test_js_divergence_zero_for_identical_and_matches_python(spark, tmp_path):
    import math
    from collections import Counter

    # two sources with the SAME distribution -> JS vs the mixture = 0;
    # one skewed source -> positive, matching a direct computation
    rows = []
    did = 0
    for src, words in [("same1", "a b c d"), ("same2", "a b c d"),
                       ("skew", "a a a a a a z z")]:
        did += 1
        rows.append((did, words, "en", src, len(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    from ballista_mvp_spark.queries.extensions import text_js_divergence

    got = {r.source: r.js_divergence
           for r in text_js_divergence(spark, str(tmp_path)).collect()}

    # direct reference
    toks = {s: t.split() for _, t, _, s, _ in
            [(r[0], r[1], r[2], r[3], r[4]) for r in rows]}
    all_toks = [w for t in toks.values() for w in t]
    m = Counter(all_toks); mt = sum(m.values())

    def js(source):
        p = Counter(toks[source]); pt = sum(p.values())
        out = 0.0
        for w in set(all_toks):
            pw = p.get(w, 0) / pt
            mw = m[w] / mt
            if pw > 0:
                out += 0.5 * pw * math.log(2 * pw / (pw + mw))
            if mw > 0:
                out += 0.5 * mw * math.log(2 * mw / (pw + mw)) if pw > 0 else 0.5 * mw * math.log(2.0)
        return out

    for s in ("same1", "same2", "skew"):
        assert abs(got[s] - round(js(s), 6)) < 2e-6, (s, got[s], js(s))
    assert got["skew"] > 0.1  # clearly shifted source scores high


def test_histogram_constant_column(spark):
    """A constant-valued column (lo == hi) must produce one bin with all
    rows, not an ANSI DIVIDE_BY_ZERO."""
    from ballista_mvp_spark.operators.pipeline import histogram

    df = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], ["v"])
    rows = histogram(df, "v", bins=4).collect()
    assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n == 3
    assert rows[0].bin_lo == 5.0


def test_decontaminate_both_plans_value_identical(spark):
    """The probe-inverted broadcast plan (eval_bounded=True) and the
    merge-hinted shuffle semi-join plan (eval_bounded=False) are two
    physical strategies for ONE semantics — on randomized corpora with
    planted overlaps they must return identical rows. Binds the round-9
    probe inversion to the legacy-direction plan it replaced."""
    import random

    rng = random.Random(907)
    vocab = [f"w{i}" for i in range(60)]

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    train_rows = [(i, doc(rng.randint(3, 30))) for i in range(40)]
    eval_rows = [(100 + i, doc(rng.randint(3, 30))) for i in range(15)]
    # planted exact overlap: one eval doc repeats a train doc verbatim
    eval_rows.append((200, train_rows[0][1]))
    train = spark.createDataFrame(train_rows, ["id", "text"])
    eval_df = spark.createDataFrame(eval_rows, ["id", "text"])
    for k in (2, 8):
        a = sorted(
            tuple(r) for r in P.decontaminate(
                train, eval_df, "id", "text", shingle_k=k, eval_bounded=True
            ).collect()
        )
        b = sorted(
            tuple(r) for r in P.decontaminate(
                train, eval_df, "id", "text", shingle_k=k, eval_bounded=False
            ).collect()
        )
        assert a == b, (k, a[:3], b[:3])
        # the planted verbatim duplicate is fully contaminated
        planted = [r for r in a if r[0] == 200][0]
        assert planted[1] == planted[2] and planted[4] is True
