"""Multimodal plumbing + text-operator unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_mvp_spark.operators import multimodal as M
from ballista_mvp_spark.operators import text as TX
from ballista_mvp_spark.tables import load_table

from .conftest import SF_SMALL


def test_featurize_matches_python(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    media = M.media_from_documents(docs)
    feats = {r.media_id: r for r in M.featurize(media).collect()}
    for row in docs.collect():
        payload = row.text.encode("utf-8")
        f = feats[row.doc_id]
        assert f.n_bytes == len(payload)
        assert abs(f.byte_mean - round(sum(payload) / len(payload), 6)) < 1e-9
        assert f.head_hex == payload[:4].hex()


def test_featurize_arrow_matches_pandas_path(spark):
    """mapInArrow featurizer must produce bit-identical rows to the
    mapInPandas one — same features, no pandas round-trip."""
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    media = M.media_from_documents(docs)
    via_pandas = {tuple(r) for r in M.featurize(media).collect()}
    via_arrow = {tuple(r) for r in M.featurize_arrow(media).collect()}
    assert via_arrow == via_pandas
    assert len(via_arrow) == 50


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")


def test_media_schema_contract(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    media = M.media_from_documents(docs)
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    assert media.schema["meta"].dataType.simpleString() == (
        "struct<mime:string,n_bytes:bigint,source:string>"
    )


def test_frame_sample_plan(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    media = M.media_from_documents(docs)
    plan = M.frame_sample_plan(media, every_n=10)
    for r in plan.groupBy("media_id").agg(F.max("frame_idx").alias("mx")).collect():
        assert r.mx % 10 == 0


def test_predict_lang_on_crafted_text(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in a house"),
            (2, "der hund ist nicht mit der katze"),
            (3, "le chat est un animal pour la maison"),
            (4, "xyzzy qwerty plugh"),
        ],
        "id long, text string",
    )
    got = {r.id: r.p for r in df.select("id", TX.predict_lang(F.col("text")).alias("p")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")], "id long, text string"
    )
    fps = [r.fp for r in df.select(TX.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_langid_trigram_crafted_corpus(spark):
    """Char-trigram rank-profile langid classifies a genuinely
    multilingual corpus perfectly when train == score (the synthetic
    documents table shares one vocabulary across lang labels, so it
    can't test discrimination — this corpus can)."""
    rows = []
    samples = {
        "en": ["the quick brown fox jumps over the lazy dog near the river",
               "she walked through the quiet streets looking for the old house"],
        "de": ["der schnelle braune fuchs springt über den faulen hund am fluss",
               "sie ging durch die stillen strassen und suchte das alte haus"],
        "fr": ["le renard brun rapide saute par dessus le chien paresseux",
               "elle marchait dans les rues calmes cherchant la vieille maison"],
    }
    i = 0
    for lang, texts in samples.items():
        for t in texts:
            rows.append((i, lang, t))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    pred = TX.langid_trigram(docs, "doc_id", "lang", "text", top_n=50)
    got = {r.doc_id: (r.lang, r.pred_lang, r.best_score) for r in pred.collect()}
    assert len(got) == len(rows)
    for _id, (lang, pred_lang, score) in got.items():
        assert pred_lang == lang, f"doc {_id}: predicted {pred_lang}, want {lang}"
        assert score > 0


def test_pii_scrub_and_counts(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "mail a.smith+x@corp.example.org now"),
            (2, "call 555-123-4567 or 555.987.6543"),
            (3, "host 192.168.0.1 is fine"),
            (4, "clean text with no identifiers"),
        ],
        "id long, t string",
    )
    c = TX.pii_counts(F.col("t"))
    out = {
        r.id: (r.e, r.p, r.i, r.s)
        for r in df.select(
            "id",
            c["email"].alias("e"),
            c["phone"].alias("p"),
            c["ipv4"].alias("i"),
            TX.pii_scrub(F.col("t")).alias("s"),
        ).collect()
    }
    assert out[1] == (1, 0, 0, "mail <EMAIL> now")
    assert out[2] == (0, 2, 0, "call <PHONE> or <PHONE>")
    assert out[3] == (0, 0, 1, "host <IPV4> is fine")
    assert out[4] == (0, 0, 0, "clean text with no identifiers")


def test_sketch_topk_exact_below_capacity(spark):
    """With vocab ≪ maxItemsTracked the approx_top_k sketch is exact:
    returned counts equal the exact rollup and no excluded token has a
    higher count than the k-th returned one."""
    from pyspark.sql import functions as F

    from ballista_mvp_spark.operators import text as TX
    from ballista_mvp_spark.queries.extensions import sketch_topk

    got = [(r.item, r.n) for r in sketch_topk(spark, SF_SMALL).collect()]
    docs = load_table(spark, SF_SMALL, "documents")
    exact = {
        r.tok: r.n
        for r in docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(got) == 12
    for item, n in got:
        assert exact[item] == n, (item, n, exact[item])
    kth = got[-1][1]
    excluded = [n for t, n in exact.items() if t not in {i for i, _ in got}]
    assert all(n <= kth for n in excluded)


def test_phash_flags_near_identical_payloads_only(spark):
    from ballista_mvp_spark.operators import multimodal as M

    base = "x" * 30 + "PATTERN-HEAVY-BYTES-0123456789" + "y" * 40
    docs = spark.createDataFrame(
        [
            (1, base, "s"),
            (2, base[:-1] + "z", "s"),                 # tail change beyond 63 bytes: identical hash
            (3, "completely different payload bytes " * 4, "s"),
        ],
        ["doc_id", "text", "source"],
    )
    media = M.media_from_documents(docs)
    sigs = {r._id: r.sh for r in M.perceptual_hash(media).collect()}
    assert sigs[1] == sigs[2] != sigs[3]
    assert all(0 <= v < 2 ** 63 for v in sigs.values())
    pairs = {(r.a, r.b): r.hamming for r in M.phash_dup_pairs(media, max_hamming=3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_tokenizer_handles_cjk_emoji_and_mixed_scripts(spark):
    """Multilingual-corpus robustness: the whitespace tokenizer must not
    crash or miscount on CJK (no spaces — one run is one token), emoji,
    combining marks, or RTL text; counts must match a Python reference
    split on the same rule."""
    texts = [
        "日本語のテキストは空白で区切られない",
        "中文 文本 有 空格",
        "emoji 🚀🔥 and flags 🇺🇳 stay intact",
        "مرحبا بالعالم",
        "combining á mark",
        "mixed 日本語 english العربية 한국어",
        "   ",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    from ballista_mvp_spark.operators.dedup import tokens

    got = {r.i: r.n for r in df.select("i", F.size(tokens(F.col("t"))).alias("n")).collect()}
    for i, t in enumerate(texts):
        expected = len([w for w in t.split()]) if t.split() else 1
        # tokens() of pure whitespace yields a single empty-string token
        # (split semantics) — the greatest(1) guards in shingles absorb it
        assert got[i] == max(expected, 1), (i, t, got[i], expected)


def test_wide_schema_aggregation_survives_codegen_limits(spark):
    """A 250-column aggregate must still produce correct sums — wide
    schemas push whole-stage codegen past its method-size limits, where
    Spark silently falls back; correctness must not depend on which
    path ran."""
    n_cols = 250
    df = spark.range(100).select(
        "id", *[(F.col("id") % (i + 2)).alias(f"c{i}") for i in range(n_cols)]
    )
    row = df.agg(*[F.sum(f"c{i}").alias(f"s{i}") for i in range(n_cols)]).first()
    for i in range(n_cols):
        expected = sum(v % (i + 2) for v in range(100))
        assert row[f"s{i}"] == expected, i


def test_bm25_topk_matches_reference_formula(spark):
    """bm25_topk vs a direct Okapi BM25 computed in Python on a planted
    corpus — scores match to 6 dp and the ranking (rounded-score DESC,
    id tiebreak) is identical."""
    import math

    from ballista_mvp_spark.operators.text import bm25_topk

    corpus = {
        1: "spark hash join spark spark",
        2: "vector index scan",
        3: "hash hash hash hash hash hash table",
        4: "the quick brown fox",
        5: "spark vector hash",
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    terms = ["spark", "vector", "hash"]
    got = {r.doc_id: (r.bm25, r.rank) for r in bm25_topk(docs, "doc_id", "text", terms, k=5).collect()}

    toks = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    k1, b = 1.2, 0.75
    expect = {}
    for d, t in toks.items():
        s = 0.0
        for term in terms:
            tf = t.count(term)
            if not tf:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            expect[d] = round(s, 6)
    order = sorted(expect, key=lambda d: (-expect[d], d))
    assert set(got) == set(expect)
    for rank, d in enumerate(order, 1):
        assert got[d][1] == rank
        assert abs(got[d][0] - expect[d]) < 1e-6


def test_clean_text_strips_controls_and_collapses(spark):
    noisy = "A\x00B\x07C\x0b ​‌﻿  Hello\t\tWorld \x7f"
    got = spark.range(1).select(TX.clean_text(F.lit(noisy)).alias("s")).collect()[0].s
    assert got == "abc hello world"
    # tabs/newlines survive as collapsed spaces; casefold optional
    kept = (
        spark.range(1)
        .select(TX.clean_text(F.lit("Keep\nCase"), lowercase=False).alias("s"))
        .collect()[0]
        .s
    )
    assert kept == "Keep Case"


def test_line_dedup_removes_corpus_boilerplate_preserving_order(spark):
    banner = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique alpha\nunique beta"),
            (2, f"unique gamma\n{banner}"),
            (3, f"{banner}"),
            (4, "unique delta\nunique epsilon"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in TX.line_dedup(docs, "doc_id", "text", min_count=2).collect()
    }
    assert set(got) == {1, 2, 3, 4}  # every doc keeps a row
    assert got[1].text_deduped == "unique alpha\nunique beta"
    assert got[1].n_lines_total == 3 and got[1].n_lines_kept == 2
    assert got[2].text_deduped == "unique gamma"
    assert got[3].text_deduped == "" and got[3].n_lines_kept == 0
    assert got[4].text_deduped == "unique delta\nunique epsilon"
    # threshold 3: the banner occurs 3x, survives min_count=4
    all_kept = {
        r.doc_id: r.n_lines_kept
        for r in TX.line_dedup(docs, "doc_id", "text", min_count=4).collect()
    }
    assert all_kept == {1: 3, 2: 2, 3: 1, 4: 2}


def test_line_dedup_plan_shuffles_hashes_not_lines(spark):
    docs = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = TX.line_dedup(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    # the line-count aggregation keys on the 64-bit hash, never the text
    assert "xxhash64" in plan


def test_dsir_logweights_match_reference_computation(spark):
    """Cross-check dsir_logweights against a pure-Python reimplementation
    of the smoothed log-ratio on a crafted corpus, and assert the
    selection signal: the target-vocabulary doc outscores the raw one."""
    import math
    from collections import Counter

    rows = [
        (0, "alpha alpha beta", True),
        (1, "alpha gamma", True),
        (2, "delta delta epsilon beta", False),
        (3, "delta epsilon epsilon", False),
        (4, "alpha alpha alpha", False),   # raw doc with target vocabulary
        (5, "delta delta delta", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    V = 3  # top-3 tokens stay, the rest fold into <oov>
    got = {
        r.doc_id: (r.n_tokens, r.log_w)
        for r in TX.dsir_logweights(
            docs, "doc_id", "text", F.col("tgt"), vocab_size=V
        ).collect()
    }

    toks = {i: t.split() for i, t, _ in rows}
    raw = Counter(w for ws in toks.values() for w in ws)
    tgt = Counter(w for i, ws in toks.items() if rows[i][2] for w in ws)
    top = sorted(raw, key=lambda w: (-raw[w], w))[:V]
    bucket = lambda w: w if w in top else "<oov>"
    b_raw, b_tgt = Counter(), Counter()
    for w, c in raw.items():
        b_raw[bucket(w)] += c
    for w, c in tgt.items():
        b_tgt[bucket(w)] += c
    n_raw, n_tgt, v = sum(b_raw.values()), sum(b_tgt.values()), len(b_raw)
    lr = {
        b: math.log((b_tgt[b] + 1.0) / (n_tgt + v))
        - math.log((b_raw[b] + 1.0) / (n_raw + v))
        for b in b_raw
    }
    for i, ws in toks.items():
        want = round(sum(lr[bucket(w)] for w in ws), 6)
        assert got[i][0] == len(ws)
        assert abs(got[i][1] - want) < 1e-9, (i, got[i][1], want)
    # the signal: target-vocab docs outscore raw-vocab docs of equal length
    assert got[4][1] > got[5][1]


def test_text_operators_on_empty_corpus(spark):
    """Zero-row input must yield zero-row output, never a crash — the
    shape a partition-pruned or fully-filtered upstream produces."""
    from ballista_mvp_spark.operators import dedup as D

    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    ops = {
        "dsir": TX.dsir_logweights(empty, "doc_id", "text", F.lit(False), vocab_size=8),
        "line_dedup": TX.line_dedup(empty, "doc_id", "text"),
        "gopher": TX.gopher_report(empty, "doc_id", "text"),
        "bigram_ce": TX.bigram_cross_entropy(empty, "doc_id", "text"),
        "exact_dedup": D.exact_dedup(empty, TX.fingerprint(F.col("text")), "doc_id"),
        "minhash": D.minhash_lsh_pairs(empty, "doc_id", "text", num_hashes=8, bands=4),
        "langid": TX.langid_trigram(empty, "doc_id", "lang", "text"),
        "bpe": TX.bpe_merges(empty, "doc_id", "text", num_merges=3),
    }
    for name, df in ops.items():
        assert df.count() == 0, name


def test_cjk_aware_token_count_crafted(spark):
    rows = [
        (1, "hello world"),                  # 2
        (2, "机器学习"),                      # 4 CJK chars
        (3, "the 机器 learning 管道 x"),     # 3 ws + 4 CJK
        (4, ""),                             # 0
        (5, "你好,世界"),                    # 4 CJK + 1 non-CJK token (the comma)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.n
        for r in df.select(
            "id", TX.cjk_aware_token_count(F.col("text")).alias("n")
        ).collect()
    }
    assert got == {1: 2, 2: 4, 3: 7, 4: 0, 5: 5}


def test_bpe_merges_hand_computed(spark):
    # corpus: "low lower" + "low" -> words low:2, lower:1
    # chars:  "l o w":2, "l o w e r":1
    # round1 pairs: l-o:3, o-w:3, w-e:1, e-r:1 -> tie 3, asc -> "l o"
    # round2: lo-w:3, w-e:1, e-r:1               -> "lo w"
    # round3: low-e:1, e-r:1 -> tie 1, asc       -> "e r"
    # round4: low-er:1                           -> "low er"
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "low")], ["doc_id", "text"]
    )
    got = [
        (r.merge_rank, r.pair, r.freq)
        for r in TX.bpe_merges(docs, "doc_id", "text", num_merges=4).collect()
    ]
    assert got == [(1, "l o", 3), (2, "lo w", 3), (3, "e r", 1), (4, "low er", 1)]


def test_bpe_merges_exhausted_corpus_stops_early(spark):
    # single 2-char word: one merge then no pairs remain -> early stop
    docs = spark.createDataFrame([(1, "ab ab")], ["doc_id", "text"])
    got = TX.bpe_merges(docs, "doc_id", "text", num_merges=5).collect()
    assert [(r.merge_rank, r.pair, r.freq) for r in got] == [(1, "a b", 2)]


def test_bpe_encode_hand_computed(spark):
    # vocab: low:2, lower:1; merges l-o then lo-w
    # low   -> "low"          (x2)
    # lower -> "low e r"      (x1)
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "low")], ["doc_id", "text"]
    )
    got = {
        r.token: (r.freq, r.n_words)
        for r in TX.bpe_encode(
            docs, "doc_id", "text", merges=["l o", "lo w"]
        ).collect()
    }
    assert got == {"low": (3, 2), "e": (1, 1), "r": (1, 1)}


def test_bpe_encode_conserves_letters(spark):
    """Tokens partition each word: sum(freq * len(token)) equals the
    total corpus letter count, for any merge table."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "banana bandana abab"), (2, "low lower lowest banana")],
        ["doc_id", "text"],
    )
    letters = docs.select(
        F.sum(F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))).alias("n")
    ).collect()[0]["n"]
    for merges in ([], ["a n"], ["a n", "b an", "an a"]):
        enc = TX.bpe_encode(docs, "doc_id", "text", merges=merges)
        tot = enc.select(
            F.sum(F.col("freq") * F.length("token")).alias("n")
        ).collect()[0]["n"]
        assert tot == letters, merges


def test_bpe_encode_uses_learned_merges(spark):
    """Feeding bpe_merges' own output pairs into bpe_encode yields the
    merged symbols as corpus tokens with the training frequencies."""
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "low")], ["doc_id", "text"]
    )
    learned = [r.pair for r in TX.bpe_merges(
        docs, "doc_id", "text", num_merges=4
    ).collect()]
    assert learned == ["l o", "lo w", "e r", "low er"]
    got = {
        r.token: r.freq
        for r in TX.bpe_encode(docs, "doc_id", "text", merges=learned).collect()
    }
    # low:2 -> "low"; lower:1 -> "lower"
    assert got == {"low": 2, "lower": 1}


def test_bpe_encode_rejects_non_alpha_merge(spark):
    docs = spark.createDataFrame([(1, "ab")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="merge pair"):
        TX.bpe_encode(docs, "doc_id", "text", merges=["a .*"])


def test_phrase_search_token_positions(spark):
    """Phrase matching is token-positional: overlapping occurrences
    count, substring-inside-a-word does not, k=3 phrases chain the
    position joins, absent docs are absent (not zero rows)."""
    docs = spark.createDataFrame(
        [
            (1, "a a a"),            # "a a" at positions 0 and 1 -> 2
            (2, "breathe cat"),      # substring 'the cat' is NOT a match
            (3, "the cat sat"),      # 3-gram match
            (4, "THE  Cat"),         # case/whitespace normalized -> 1
            (5, "cat the"),          # wrong order -> no row
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n_matches
           for r in TX.phrase_search(docs, "doc_id", "text", "a a").collect()}
    assert got == {1: 2}
    got = {r.doc_id: r.n_matches
           for r in TX.phrase_search(docs, "doc_id", "text", "the cat").collect()}
    assert got == {3: 1, 4: 1}
    got = {r.doc_id: r.n_matches
           for r in TX.phrase_search(docs, "doc_id", "text", "the cat sat").collect()}
    assert got == {3: 1}
    with pytest.raises(ValueError, match="empty phrase"):
        TX.phrase_search(docs, "doc_id", "text", "  ")


def test_featurize_arrow_trailing_empty_payload(spark):
    """A batch whose FINAL payload is empty previously crashed the Arrow
    path (reduceat start offset == len(data)); the prefix-sum rewrite
    must match featurize() bit-for-bit including empties and keep the
    preceding payload's sum exact."""
    from ballista_mvp_spark.operators import multimodal as M

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"abc"), "{}"), (2, "image", bytearray(b""), "{}")],
        "media_id long, kind string, payload binary, meta string",
    ).coalesce(1)
    via_arrow = {tuple(r) for r in M.featurize_arrow(media).collect()}
    via_pandas = {tuple(r) for r in M.featurize(media).collect()}
    assert via_arrow == via_pandas
    by_id = {r[0]: r for r in via_arrow}
    assert by_id[1][1] == 3 and abs(by_id[1][2] - ((97 + 98 + 99) / 3)) < 1e-6
    assert by_id[2][1] == 0 and by_id[2][2] == 0.0


def test_trigram_queries_survive_short_documents(spark, tmp_path):
    """Sub-3-token documents must yield NO trigrams (matching the
    oracles' generate_series(1, len-2)), not a descending [0,-1]
    sequence that crashes element_at — reproduces the round-6 review
    finding against dedup_minhash_det / text_ngram_novelty."""
    import os

    from ballista_mvp_spark.queries.extensions import (
        dedup_minhash_det,
        text_ngram_novelty,
    )

    docs = spark.createDataFrame(
        [
            (1, "one", "en", "web"),
            (2, "two words", "en", "web"),
            (3, "three whole words here", "en", "web"),
            (4, "three whole words here", "en", "web"),
            (5, "", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    nov = {r.doc_id: r for r in text_ngram_novelty(spark, d).collect()}
    assert 3 in nov and 4 in nov  # >=3-token docs still scored
    assert all(did not in nov or nov[did].n_grams == 0 for did in (1, 2, 5))
    pairs = dedup_minhash_det(spark, d).collect()  # must not crash
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(3, 4)}
