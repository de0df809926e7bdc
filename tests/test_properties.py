"""Property-based invariants (hypothesis) for the pipeline primitives —
the contracts that must hold for ANY corpus, not just the synthetic one:

- hash_split is a pure function of (salt, id) matching an independent
  python md5 reimplementation (engine portability — the property that
  lets DuckDB replay membership),
- pack_sequences offsets tile the token stream with no gaps for any
  token-count vector (the distributed prefix sum is exact),
- span_dedup conserves spans: kept spans across the corpus == distinct
  spans, and an all-unique corpus passes through unchanged.

Each example is a Spark round trip, so examples are few and small; the
sf-scale behavior of the same operators is covered by the oracle gate.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ballista_mvp_spark.operators import dedup as D
from ballista_mvp_spark.operators import pipeline as P

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(ids=st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=30, unique=True))
@settings(**SETTINGS)
def test_hash_split_matches_python_md5(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r["id"]: (r["bucket"], r["split"]) for r in P.hash_split(df, "id").collect()}
    for i in ids:
        b = int(hashlib.md5(f"split:{i}".encode()).hexdigest()[:2], 16)
        want = "train" if b < 205 else ("val" if b < 230 else "test")
        assert got[i] == (b, want)


@given(ns=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_pack_sequences_tiles_any_stream(spark, ns):
    df = spark.createDataFrame(list(enumerate(ns)), "id long, n long")
    rows = P.pack_sequences(df, "id", F.col("n"), seq_len=64, chunk=7).orderBy("id").collect()
    off = 0
    for r in rows:
        assert r["start_off"] == off
        assert r["seq_id"] == off // 64 and r["seq_off"] == off % 64
        off += r["n_tok"]


WS_TEXT = st.text(
    alphabet=st.sampled_from(list("ab XY\t\n\r\x0b\f.")), min_size=0, max_size=40
)


@given(texts=st.lists(WS_TEXT, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_tokens_matches_python_reference(spark, texts):
    """tokens() (single-regex-pass split) must agree with the spec:
    lowercase, collapse \\s+ runs, trim, split on single spaces — for
    ANY whitespace layout (the r3 rewrite changed the implementation,
    not the contract)."""
    import re

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    got = {r["id"]: r["toks"] for r in df.select("id", D.tokens(F.col("t")).alias("toks")).collect()}
    for i, t in enumerate(texts):
        want = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        assert got[i] == want, (repr(t), got[i], want)


@given(counts=st.dictionaries(st.sampled_from([f"t{i}" for i in range(20)]),
                              st.integers(min_value=1, max_value=5),
                              min_size=1, max_size=12))
@settings(**SETTINGS)
def test_cms_never_undercounts_any_multiset(spark, counts):
    from ballista_mvp_spark.operators import sketch as SK

    occ = spark.createDataFrame(
        [(t,) for t, n in counts.items() for _ in range(n)], "term string"
    )
    cms = SK.cms_build(occ, "term", depth=3, width=64)
    items = spark.createDataFrame([(t,) for t in counts], "term string")
    est = {r.term: r.est for r in SK.cms_estimate(cms, items, "term", 3, 64).collect()}
    for t, n in counts.items():
        assert est[t] >= n, (t, est[t], n)


WORDS = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=24
)


@given(docs=st.lists(WORDS, min_size=2, max_size=6))
@settings(**SETTINGS)
def test_minhash_reports_only_exact_pairs(spark, docs):
    """Verified-pairs invariant: every pair minhash_lsh_pairs reports is
    an EXACT Jaccard-qualified pair (the LSH stage may miss pairs, never
    invent them) — for any corpus."""
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "id long, text string"
    )
    found = {
        (r.a, r.b): r.jaccard
        for r in D.minhash_lsh_pairs(
            df, "id", "text", num_hashes=8, bands=4, shingle_k=2, jaccard_threshold=0.3
        ).collect()
    }

    def sh(ws):
        if len(ws) < 2:
            return {tuple(ws)} if ws else set()
        return {tuple(ws[i : i + 2]) for i in range(len(ws) - 1)}

    for (a, b), j in found.items():
        sa, sb = sh(docs[a]), sh(docs[b])
        exact = len(sa & sb) / len(sa | sb)
        assert abs(j - exact) < 1e-6 and exact >= 0.3, (a, b, j, exact)


@given(docs=st.lists(WORDS, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_span_dedup_conserves_distinct_spans(spark, docs):
    span = 4
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "id long, text string"
    )
    out = D.span_dedup(df, "id", "text", span=span).collect()
    # python ground truth: spans in (id, pos) order, first occurrence kept
    seen, kept_per_doc = set(), {}
    for i, ws in enumerate(docs):
        kept = []
        for s in range(0, len(ws), span):
            gram = tuple(ws[s : s + span])
            if gram not in seen:
                seen.add(gram)
                kept.append(" ".join(gram))
        kept_per_doc[i] = " ".join(kept)
    for r in out:
        assert r["text_dedup"] == kept_per_doc[r["id"]]
        assert r["n_kept"] + r["n_dropped"] == r["n_spans"]
    assert sum(r["n_kept"] for r in out) == len(seen)


_ASOF_EVENT = st.tuples(
    st.integers(min_value=0, max_value=3),          # key
    st.integers(min_value=0, max_value=10_000),     # epoch seconds
)


@given(
    left=st.lists(_ASOF_EVENT, min_size=1, max_size=25),
    right=st.lists(_ASOF_EVENT, min_size=1, max_size=25),
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.sampled_from([None, 60, 1000]),
)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction, tolerance):
    """asof_join must agree with pandas.merge_asof — the de-facto
    reference semantics — on arbitrary keyed event sets, in both
    directions, with and without a tolerance bound."""
    import pandas as pd

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, sec long, lid int"
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "lid")
    # pandas requires sorted-by-time frames and unique right times per
    # key for a deterministic match; dedupe right on (k, ts) keeping the
    # largest v (mirrors what the Spark side's last-non-null walk picks
    # when ties exist) — so restrict to unique (k, ts) in both engines
    rpd = (
        pd.DataFrame([(k, t, float(i)) for i, (k, t) in enumerate(right)],
                     columns=["k", "sec", "v"])
        .drop_duplicates(subset=["k", "sec"], keep="last")
    )
    rdf = spark.createDataFrame(
        [(int(r.k), int(r.sec), float(r.v)) for r in rpd.itertuples()],
        "k int, sec long, v double",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "v")

    from ballista_mvp_spark.operators.asof import asof_join

    got = {
        (r.lid, r.v)
        for r in asof_join(
            ldf, rdf, key="k", left_time="ts", right_time="ts",
            value_cols=["v"], direction=direction,
            tolerance_seconds=tolerance,
        ).collect()
    }

    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "sec", "lid"]
    )
    lpd["ts"] = pd.to_datetime(lpd["sec"], unit="s")
    rpd["ts"] = pd.to_datetime(rpd["sec"], unit="s")
    merged = pd.merge_asof(
        lpd.sort_values(["ts", "lid"]),
        rpd.sort_values("ts")[["k", "ts", "v"]],
        on="ts", by="k", direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
    )
    expected = {
        (int(r.lid), None if pd.isna(r.v) else float(r.v))
        for r in merged.itertuples()
    }
    assert got == expected


@given(lens=st.lists(st.integers(min_value=0, max_value=4096), min_size=1, max_size=80))
@settings(**SETTINGS)
def test_round_robin_desc_bins_spread_bounded(spark, lens):
    """Round-robin over descending lengths: the max-min spread of bin
    totals never exceeds the largest single item (the classic bound that
    makes this the distributed stand-in for first-fit-decreasing)."""
    n_bins = 4
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "id long, n_tok long"
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("n_tok").desc(), "id")
    totals = [
        r.t
        for r in df.withColumn("bin", (F.row_number().over(w) - 1) % n_bins)
        .groupBy("bin")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    ]
    while len(totals) < n_bins:
        totals.append(0)
    assert max(totals) - min(totals) <= max(lens)


@given(xs=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_ewma_closed_form_equals_recursive(spark, xs):
    """The window-sum closed form behind events_ewma (ratio of two
    running sums with p^{-i} weights) must equal the adjusted-EWMA
    recursive definition computed directly in Python."""
    from pyspark.sql import Window as W

    p = 0.7
    df = spark.createDataFrame([(i + 1, float(x)) for i, x in enumerate(xs)], "i int, x double")
    wc = W.orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)
    num = F.sum(F.col("x") * F.pow(F.lit(p), -F.col("i").cast("double"))).over(wc)
    den = F.sum(F.pow(F.lit(p), -F.col("i").cast("double"))).over(wc)
    got = [r.e for r in df.select("i", (num / den).alias("e")).orderBy("i").collect()]
    # reference: adjusted EWMA y_t = sum(p^(t-i) x_i) / sum(p^(t-i))
    expected = []
    for t in range(1, len(xs) + 1):
        ws = [p ** (t - i) for i in range(1, t + 1)]
        expected.append(sum(w * x for w, x in zip(ws, xs)) / sum(ws))
    for g, e in zip(got, expected):
        assert abs(g - e) < 1e-6 * max(1.0, abs(e)), (g, e)


@given(
    members=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
    probes=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
)
@settings(**SETTINGS)
def test_bloom_never_false_negative(spark, members, probes):
    from ballista_mvp_spark.operators import bloom as B

    mdf = spark.createDataFrame([(m,) for m in members], "k long")
    words = B.bloom_build(mdf, F.col("k").cast("string"), m_bits=1 << 12, k=4)
    pdf = spark.createDataFrame([(x,) for x in members | probes], "k long")
    hits = {
        r.k
        for r in pdf.withColumn(
            "hit", B.bloom_might_contain(F.col("k").cast("string"), words, 1 << 12, 4)
        ).collect()
        if r.hit
    }
    assert members <= hits  # every member must hit — no false negatives


@given(
    n_sources=st.integers(min_value=1, max_value=5),
    per_source=st.integers(min_value=1, max_value=20),
)
@settings(**SETTINGS)
def test_interleave_prefix_balance_on_equal_sources(spark, n_sources, per_source):
    """With equally-sized sources, every prefix of length k*n_sources of
    the (seq, source) order contains exactly k docs from each source —
    the round-robin guarantee pipeline_interleave's docstring claims."""
    from pyspark.sql import Window as W

    rows = [
        (s * 1000 + i, f"src{s}") for s in range(n_sources) for i in range(per_source)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = W.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("ileave:"), F.col("doc_id"))), "doc_id"
    )
    ordered = [
        r.source
        for r in df.select("doc_id", "source", F.row_number().over(w).alias("seq"))
        .orderBy("seq", "source", "doc_id")
        .collect()
    ]
    for k in range(1, per_source + 1):
        prefix = ordered[: k * n_sources]
        for s in range(n_sources):
            assert prefix.count(f"src{s}") == k, (k, s)


@given(
    texts=st.lists(st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=20),
    drop_mod=st.integers(min_value=2, max_value=5),
    change_mod=st.integers(min_value=2, max_value=5),
)
@settings(**SETTINGS)
def test_snapshot_diff_statuses_match_python_reference(spark, texts, drop_mod, change_mod):
    """The full-outer fingerprint-diff classification must match a plain
    Python re-derivation for arbitrary corpora and mutation rules."""
    old = {i: t for i, t in enumerate(texts)}
    new = {}
    for i, t in old.items():
        if i % drop_mod == 0:
            continue
        new[i] = t + " v2" if i % change_mod == 0 else t
    new[10_000] = "fresh"
    expected = {}
    for i in set(old) | set(new):
        if i not in old:
            expected[i] = "added"
        elif i not in new:
            expected[i] = "removed"
        elif old[i] == new[i]:
            expected[i] = "unchanged"
        else:
            expected[i] = "changed"

    odf = spark.createDataFrame(list(old.items()), "doc_id long, text string").select(
        "doc_id", F.md5("text").alias("fp_old")
    )
    ndf = spark.createDataFrame(list(new.items()), "doc_id long, text string").select(
        "doc_id", F.md5("text").alias("fp_new")
    )
    j = odf.join(ndf, "doc_id", "full")
    status = (
        F.when(F.col("fp_old").isNull(), "added")
        .when(F.col("fp_new").isNull(), "removed")
        .when(F.col("fp_old") == F.col("fp_new"), "unchanged")
        .otherwise("changed")
    )
    got = {r.doc_id: r.s for r in j.select("doc_id", status.alias("s")).collect()}
    assert got == expected


@given(
    docs=st.lists(WORDS, min_size=2, max_size=8),
    tgt_mod=st.integers(min_value=2, max_value=4),
    vocab=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_dsir_logweights_match_python_reference(spark, docs, tgt_mod, vocab):
    """dsir_logweights equals the pure-Python smoothed log-ratio sum for
    ANY corpus, target slice, and vocab cutoff (including all-target /
    no-oov edge shapes)."""
    import math
    from collections import Counter

    from ballista_mvp_spark.operators import text as TX

    rows = [(i, " ".join(ws), i % tgt_mod == 0) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {
        r.doc_id: (r.n_tokens, r.log_w)
        for r in TX.dsir_logweights(
            df, "doc_id", "text", F.col("tgt"), vocab_size=vocab
        ).collect()
    }

    raw = Counter(w for ws in docs for w in ws)
    tgt = Counter(w for i, ws in enumerate(docs) if i % tgt_mod == 0 for w in ws)
    top = set(sorted(raw, key=lambda w: (-raw[w], w))[:vocab])
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
    for i, ws in enumerate(docs):
        want = round(sum(lr[bucket(w)] for w in ws), 6)
        assert got[i][0] == len(ws)
        assert abs(got[i][1] - want) < 1e-9, (i, got[i][1], want)


OPS_STRATEGY = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 5)),
        st.tuples(st.just("overwrite"), st.integers(0, 5)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("vacuum"), st.integers(1, 3)),
    ),
    min_size=1,
    max_size=6,
)


@given(ops=OPS_STRATEGY)
@settings(**SETTINGS)
def test_versioned_table_log_matches_model(spark, tmp_path_factory, ops):
    """Model-based check of the versioned-table transaction log: ANY
    sequence of append/overwrite/compact/vacuum must keep every
    surviving version's contents equal to a pure-Python model, and
    vacuum must never delete a file a kept manifest references."""
    from ballista_mvp_spark.sources import versioned as V

    t = str(tmp_path_factory.mktemp("vt") / "tbl")
    model: dict[int, list[int]] = {}  # version -> sorted ids
    latest: list[int] = []
    next_ids = iter(range(10_000))

    def fresh_batch(n):
        ids = [next(next_ids) for _ in range(n + 1)]
        return ids, spark.createDataFrame([(i,) for i in ids], "id long")

    for op, arg in ops:
        if op == "append":
            ids, df = fresh_batch(arg)
            v = V.write_versioned(df, t, mode="append")
            latest = sorted(latest + ids)
            model[v] = latest
        elif op == "overwrite":
            ids, df = fresh_batch(arg)
            v = V.write_versioned(df, t, mode="overwrite")
            latest = sorted(ids)
            model[v] = latest
        elif op == "compact":
            if not model:
                continue
            v = V.compact_versioned(spark, t)
            model[v] = latest
        elif op == "vacuum":
            if not model:
                continue
            kept = sorted(model)[-arg:]
            V.vacuum(t, keep_last=arg)
            model = {v: model[v] for v in kept}
        # invariant: every surviving version reads back exactly the model
        hist = [h["version"] for h in V.history(t)]
        assert hist == sorted(model)
        for v in hist:
            got = sorted(r.id for r in V.read_versioned(spark, t, version=v).collect())
            assert got == model[v], (op, v)


def _ref_bpe(docs: list[str], k: int) -> list[tuple[int, str, int]]:
    """Pure-Python BPE reference (Sennrich et al. 2016): word-frequency
    table, argmax adjacent pair by (freq desc, pair asc), merge, repeat."""
    import re
    from collections import Counter

    words = Counter()
    for t in docs:
        for w in re.findall(r"[a-z]+", t.lower()):
            if 1 <= len(w) <= 20:
                words[w] += 1
    state = {tuple(w): c for w, c in words.items()}
    out = []
    for rank in range(1, k + 1):
        pairs = Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (pa, pb), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, f"{pa} {pb}", freq))
        merged = {}
        for syms, c in state.items():
            s, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    s.append(pa + pb)
                    i += 2
                else:
                    s.append(syms[i])
                    i += 1
            key = tuple(s)
            merged[key] = merged.get(key, 0) + c
        state = merged
    return out


LETTER_WORDS = st.lists(
    st.sampled_from(
        ["low", "lower", "lowest", "newer", "wider", "new", "aaa", "aab",
         "ab", "banana", "bandana", "abab"]
    ),
    min_size=1,
    max_size=24,
)


@given(docs=st.lists(LETTER_WORDS, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_bpe_merges_match_python_reference(spark, docs):
    """The distributed BPE merge sequence equals the sequential reference
    on ANY corpus — same words, same tie-breaks, same frequencies."""
    from ballista_mvp_spark.operators import text as TX

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.merge_rank, r.pair, r.freq)
        for r in TX.bpe_merges(df, "doc_id", "text", num_merges=3).collect()
    ]
    assert got == _ref_bpe(texts, 3)


def test_poisson_bootstrap_weights_distribution(spark):
    """stats_bootstrap's md5-inverse-CDF Poisson(1) draws: on a large
    deterministic id set the empirical weight distribution must track
    the Poisson(1) pmf (within 3-sigma binomial tolerance), the mean
    weight must be ~1 (the unbiasedness condition of the Poisson
    bootstrap), and the draws must be exactly reproducible."""
    import math

    from pyspark.sql import functions as F
    from ballista_mvp_spark.queries.extensions import _boot_weight

    n = 20_000
    ids = spark.range(n)
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("boot:0:"), F.col("id").cast("string"))), 1, 8),
            16, 10,
        ).cast("double") / 4294967296.0
    )
    w = ids.select(_boot_weight(u).alias("w"))
    counts = {r.w: r.c for r in w.groupBy("w").agg(F.count("*").alias("c")).collect()}
    mean_w = sum(k * c for k, c in counts.items()) / n
    assert abs(mean_w - 1.0) < 0.03
    for k in range(4):
        pmf = math.exp(-1) / math.factorial(k)
        exp_c = n * pmf
        sigma = (n * pmf * (1 - pmf)) ** 0.5
        assert abs(counts.get(k, 0) - exp_c) < 3.5 * sigma, (k, counts.get(k, 0), exp_c)
    # exact reproducibility (pure function of salt+id)
    again = {r.w: r.c for r in ids.select(_boot_weight(u).alias("w")).groupBy("w").agg(F.count("*").alias("c")).collect()}
    assert again == counts


def test_rolling_median_composition_matches_python(spark):
    """events_rolling_median's sort_array/collect_list interpolation,
    checked against Python statistics.median over random series — the
    engine-independent pin of the frame-median composition (the oracle
    pins DuckDB; this pins the math)."""
    import random
    import statistics

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rng = random.Random(11)
    xs = [float(rng.randrange(100)) for _ in range(40)]
    df = spark.createDataFrame(list(enumerate(xs)), ["i", "v"])
    w = W.orderBy("i").rowsBetween(-6, 0)
    arr = F.sort_array(F.collect_list(F.col("v")).over(w))
    sz = F.size(arr)
    mid_hi = F.element_at(arr, (sz / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, F.greatest((sz / 2).cast("int"), F.lit(1)))
    med = F.when(
        sz % 2 == 1, F.element_at(arr, ((sz + 1) / 2).cast("int"))
    ).otherwise((mid_lo + mid_hi) / 2.0)
    got = {r.i: r.m for r in df.select("i", med.alias("m")).collect()}
    for i in range(40):
        window = xs[max(0, i - 6): i + 1]
        assert got[i] == statistics.median(window), (i, got[i], window)


def test_wilson_interval_bounds_and_coverage(spark):
    """stats_wilson's interval arithmetic, pinned against a direct
    Python evaluation on random (k, n): the interval must stay inside
    [0, 1], contain p-hat, and match the closed form to 1e-12."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(3)
    rows = [(i, rng.randrange(0, n + 1), n)
            for i, n in enumerate(rng.randrange(5, 500) for _ in range(60))]
    df = spark.createDataFrame(rows, ["i", "k", "n"])
    z = 1.959963984540054
    p = F.col("k") / F.col("n")
    z2n = F.lit(z * z) / F.col("n")
    center = (p + z2n / 2) / (1 + z2n)
    half = F.lit(z) * F.sqrt(p * (1 - p) / F.col("n") + z2n / (4 * F.col("n"))) / (1 + z2n)
    got = {r.i: (r.lo, r.hi) for r in df.select(
        "i", (center - half).alias("lo"), (center + half).alias("hi")).collect()}
    for i, k, n in rows:
        ph = k / n
        z2 = z * z / n
        c = (ph + z2 / 2) / (1 + z2)
        h = z * ((ph * (1 - ph) / n + z2 / (4 * n)) ** 0.5) / (1 + z2)
        lo, hi = got[i]
        assert abs(lo - (c - h)) < 1e-12 and abs(hi - (c + h)) < 1e-12
        assert -1e-12 <= lo <= ph + 1e-12 <= hi <= 1 + 1e-12


def test_percentile_vector_matches_numpy_linear(spark):
    """stats_qq's multi-quantile aggregate: Spark F.percentile must
    agree with numpy's linear-interpolation percentile (the method
    DuckDB's quantile_cont also implements) on random doubles."""
    import numpy as np

    from pyspark.sql import functions as F

    rng = np.random.RandomState(9)
    xs = rng.uniform(0, 1000, 137)
    ps = [round(0.05 * i, 2) for i in range(1, 20)]
    df = spark.createDataFrame([(float(x),) for x in xs], ["v"])
    got = df.agg(F.percentile("v", F.lit(ps)).alias("q")).collect()[0].q
    want = np.percentile(xs, [p * 100 for p in ps], method="linear")
    assert np.allclose(got, want, rtol=0, atol=1e-9)


# -- SQL micro-parser properties (engine.py) ---------------------------------

_sql_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)
# literal body: anything without a quote, with '' escapes injected
_lit_body = st.text(
    alphabet=st.characters(blacklist_characters="'"), max_size=12
)


@given(
    cols=st.lists(_sql_ident, min_size=1, max_size=5, unique=True),
    lits=st.lists(_lit_body, min_size=1, max_size=5),
)
@settings(max_examples=50, deadline=None)
def test_split_assignments_roundtrips_any_literal(cols, lits):
    """For ANY assignment list col = '<literal>' (commas, parens, '=',
    CASE keywords inside the literal; '' escapes), _split_assignments
    recovers exactly the written pairs — the property that makes quoted
    UPDATE SET parsing safe for arbitrary user strings."""
    from ballista_mvp_spark.engine import _split_assignments

    n = min(len(cols), len(lits))
    cols, lits = cols[:n], lits[:n]
    # embed hostile substrings and '' escaping into the literals
    quoted = ["'" + (b + ",)=(' '").replace("' '", "''") + "'" for b in lits]
    text = ", ".join(f"{c} = {q}" for c, q in zip(cols, quoted))
    got = _split_assignments(text)
    assert got == {c: q for c, q in zip(cols, quoted)}


@given(
    cols=st.lists(_sql_ident, min_size=1, max_size=4, unique=True),
    pad=st.sampled_from(["", " ", "  "]),
    vals=st.lists(st.integers(min_value=0, max_value=99), min_size=1, max_size=4),
)
@settings(max_examples=50, deadline=None)
def test_insert_column_list_parse_is_exact(cols, pad, vals):
    """The INSERT column-list scanner (the REAL one from engine.py)
    recovers exactly the written identifier list and leaves exactly the
    source text, for any identifiers, spacing, and VALUES arity — and
    never mistakes a parenthesized SELECT for a column list."""
    from ballista_mvp_spark.engine import _parse_insert_column_list as parse

    n = min(len(cols), len(vals))
    cols, vals = cols[:n], vals[:n]
    src = "VALUES (" + ", ".join(str(v) for v in vals) + ")"
    tail = f"({pad}{', '.join(cols)}{pad}) {src}"
    got_cols, got_rest = parse(tail)
    assert got_cols == [c.lower() for c in cols]
    assert got_rest == src
    # a parenthesized SELECT is NEVER a column list (nothing follows it)
    got_cols2, got_rest2 = parse(f"(SELECT {', '.join(str(v) for v in vals)})")
    assert got_cols2 is None


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=1, max_value=20),
        ),
        min_size=1,
        max_size=40,
    ),
    q=st.sampled_from([0.01, 0.25, 0.5, 0.9, 1.0]),
)
@settings(**SETTINGS)
def test_weighted_percentile_matches_python_reference(spark, rows, q):
    """weighted_percentile (the APPROX_PERCENTILE_CONT_WITH_WEIGHT exact
    shim) must equal the spec for ANY multiset and quantile: the
    smallest value whose cumulative weight — in (value, weight) order —
    reaches q x total weight. The Python reference reproduces the same
    float comparison (long cum >= double q*total) so boundary behavior
    is bit-identical, not approximately equal."""
    from ballista_mvp_spark.operators.aggregates import weighted_percentile

    df = spark.createDataFrame(rows, "g int, v int, w int")
    got = {
        r["g"]: r["wpct"]
        for r in weighted_percentile(df, ["g"], "v", "w", q).collect()
    }
    by_g: dict[int, list[tuple[int, int]]] = {}
    for g, v, w in rows:
        by_g.setdefault(g, []).append((v, w))
    for g, vw in by_g.items():
        vw.sort()
        total = sum(w for _, w in vw)
        cum = 0
        want = None
        for v, w in vw:
            cum += w
            if cum >= q * total:
                want = v
                break
        assert got[g] == want, (g, q, vw, got[g], want)


@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=4),
            ),
            min_size=1,
            max_size=4,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_scd2_merge_matches_python_model(spark, batches):
    """Folding ANY sequence of update batches through scd2_merge must
    match the obvious Python type-2 model: per key one open row whose
    attr is the latest observed value, closed rows exactly the
    (old_attr, since, until) intervals of every change, nothing lost or
    duplicated across merges."""
    from ballista_mvp_spark.operators.scd import scd2_merge

    current = spark.createDataFrame(
        [], "key int, attr int, valid_from int, valid_to int"
    )
    open_model: dict[int, tuple[int, int]] = {}
    closed_model: list[tuple[int, int, int, int]] = []
    for i, batch in enumerate(batches):
        ts = i + 1
        updates = spark.createDataFrame(batch, "key int, attr int")
        current = scd2_merge(
            current, updates, "key", ["attr"], F.lit(ts)
        ).localCheckpoint(eager=True)
        for k, a in batch:
            if k in open_model and open_model[k][0] != a:
                attr0, since = open_model.pop(k)
                closed_model.append((k, attr0, since, ts))
            if k not in open_model:
                open_model[k] = (a, ts)
    rows = current.collect()
    got_open = {
        r["key"]: (r["attr"], r["valid_from"])
        for r in rows
        if r["valid_to"] is None
    }
    got_closed = sorted(
        (r["key"], r["attr"], r["valid_from"], r["valid_to"])
        for r in rows
        if r["valid_to"] is not None
    )
    assert got_open == open_model
    assert got_closed == sorted(closed_model)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=40,
    ),
    n_salt=st.sampled_from([1, 3, 16]),
)
@settings(**SETTINGS)
def test_salted_agg_equals_plain_for_any_frame(spark, rows, n_salt):
    """Two-stage salted aggregation must be value-identical to the plain
    one-stage groupBy for ANY frame and salt width — sum/count/min/max
    are algebraic, so the (keys, salt) partial + keys merge is exact,
    never approximate."""
    from ballista_mvp_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, "k int, v int")
    aggs = {
        "s": ("sum", "v"),
        "n": ("count", "v"),
        "mn": ("min", "v"),
        "mx": ("max", "v"),
    }
    got = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_agg(df, ["k"], aggs, n_salt=n_salt).collect()
    }
    want = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


@given(
    left=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=-9, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    right=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=-9, max_value=9),
        ),
        min_size=0,
        max_size=25,
    ),
    n_salt=st.sampled_from([1, 4]),
)
@settings(**SETTINGS)
def test_salted_join_equals_plain_for_any_frames(spark, left, right, n_salt):
    """The hot-key salted inner equi-join must return exactly the plain
    join's row multiset for ANY pair of frames (duplicates included —
    the explode x salt-match must neither drop nor duplicate pairs)."""
    from ballista_mvp_spark.operators.skew import salted_join

    l = spark.createDataFrame(left, "k int, v int")
    r = spark.createDataFrame(right, "k2 int, w int")
    got = sorted(
        (x["k"], x["v"], x["w"])
        for x in salted_join(l, r, "k", "k2", n_salt=n_salt).collect()
    )
    want = sorted(
        (x["k"], x["v"], x["w"])
        for x in l.join(r, l["k"] == r["k2"]).collect()
    )
    assert got == want


@given(
    left=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
            st.integers(min_value=-9, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    right=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=-9, max_value=9),
        ),
        min_size=0,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
)
@settings(**SETTINGS)
def test_null_split_left_join_equals_plain_for_any_frames(spark, left, right):
    """Routing null-key rows around the join must be row-identical to the
    plain LEFT OUTER join for ANY null mix — including all-null and
    no-null frames (the split's two degenerate branches)."""
    from ballista_mvp_spark.operators.skew import null_split_left_join

    def _key(t):
        return tuple((x is None, x if x is not None else 0) for x in t)

    l = spark.createDataFrame(left, "k int, v int")
    r = spark.createDataFrame(right, "k int, w int")
    got = sorted(
        (
            (x["k"], x["v"], x["w"])
            for x in null_split_left_join(l, r, "k").collect()
        ),
        key=_key,
    )
    want = sorted(
        ((x["k"], x["v"], x["w"]) for x in l.join(r, "k", "left").collect()),
        key=_key,
    )
    assert got == want


@given(
    lts=st.lists(
        st.integers(min_value=0, max_value=600), min_size=1, max_size=20
    ),
    rts=st.lists(
        st.integers(min_value=0, max_value=600), min_size=0, max_size=20
    ),
    bounds=st.sampled_from([(0, 60), (-30, 30), (5, 7), (-90, -10), (0, 0)]),
    bucket=st.sampled_from([None, 1, 7, 64]),
)
@settings(**SETTINGS)
def test_range_join_matches_python_reference(spark, lts, rts, bounds, bucket):
    """range_join (bucketed equi-join + residual) must return exactly the
    pairs with r.ts in [l.ts+lower, l.ts+upper] for ANY timestamps,
    bound signs (negative windows, zero-width), and bucket width —
    the +2 bucket slack and the µs-exact residual must neither leak
    out-of-range pairs nor drop boundary-inclusive ones."""
    from ballista_mvp_spark.operators.asof import range_join

    lower, upper = bounds
    l = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lts)], "lid int, lt_s long"
    ).select("lid", F.timestamp_seconds("lt_s").alias("lt"))
    r = spark.createDataFrame(
        [(j, t) for j, t in enumerate(rts)], "rid int, rt_s long"
    ).select("rid", F.timestamp_seconds("rt_s").alias("rt"))
    got = sorted(
        (x["lid"], x["rid"])
        for x in range_join(
            l, r, F.col("lt"), F.col("rt"), lower, upper,
            bucket_seconds=bucket,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, lt in enumerate(lts)
        for j, rt in enumerate(rts)
        if lt + lower <= rt <= lt + upper
    )
    assert got == want, (bounds, bucket, got, want)


# --- shingle pair operators vs brute-force all-pairs references -------------
# (VERDICT r7 #5: same pattern as the range_join property above — the
# inverted-index plan must return EXACTLY the pairs a quadratic all-pairs
# computation over string shingle sets would, for ANY corpus shape:
# empty docs, sub-k docs, identical docs, disjoint docs.)

_SHINGLE_DOC = st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8)


def _shingle_sets(docs, k):
    """String-shingle reference with the engine's short-document
    fallback: a doc with fewer than k tokens contributes ONE shingle of
    its whole token list (hashed_shingles skips the out-of-range null
    grams), and empty text tokenizes to a single empty-string token —
    so two empty docs are identical (containment/Jaccard 1.0)."""
    out = []
    for ws in docs:
        toks = ws if ws else [""]
        if len(toks) >= k:
            out.append({tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)})
        else:
            out.append({tuple(toks)})
    return out


@given(
    docs=st.lists(_SHINGLE_DOC, min_size=2, max_size=8),
    k=st.sampled_from([2, 3]),
    thr=st.sampled_from([0.2, 0.5]),
)
@settings(**SETTINGS)
def test_ngram_jaccard_matches_brute_force(spark, docs, k, thr):
    """ngram_jaccard_pairs (explode → shingle self-join → set algebra on
    counts) equals the quadratic set-Jaccard over string shingles —
    values AND membership, including the rounded-then-filtered boundary."""
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(
            df, "doc_id", "text", shingle_k=k, threshold=thr
        ).collect()
    }
    sets = _shingle_sets(docs, k)
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            c = len(sets[a] & sets[b])
            u = len(sets[a]) + len(sets[b]) - c
            if c:
                j = round(c / u, 6)
                if j >= thr:
                    want[(a, b)] = j
    assert got == want, (docs, k, thr, got, want)


@given(
    docs=st.lists(_SHINGLE_DOC, min_size=2, max_size=8),
    k=st.sampled_from([2, 3]),
    thr=st.sampled_from([0.4, 1.0]),
)
@settings(**SETTINGS)
def test_containment_matches_brute_force(spark, docs, k, thr):
    """containment_pairs equals the quadratic C(A,B)=|A∩B|/min(|A|,|B|)
    reference, including the DIRECTED output contract: contained = the
    smaller shingle set, ties broken by lower id. The filter compares
    the UNROUNDED ratio (only the output value is rounded)."""
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["contained"], r["container"]): r["containment"]
        for r in D.containment_pairs(
            df, "doc_id", "text", shingle_k=k, threshold=thr
        ).collect()
    }
    sets = _shingle_sets(docs, k)
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            c = len(sets[a] & sets[b])
            if not c:
                continue
            cont = c / min(len(sets[a]), len(sets[b]))
            if cont >= thr:
                small, big = (b, a) if len(sets[b]) < len(sets[a]) else (a, b)
                want[(small, big)] = round(cont, 6)
    assert got == want, (docs, k, thr, got, want)


@given(
    sigs=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2, max_size=20, unique=True,
    ),
    max_h=st.sampled_from([0, 1, 2, 3]),
)
@settings(**SETTINGS)
def test_hamming_band_pairs_exact_up_to_3_bits(spark, sigs, max_h):
    """hamming_band_pairs (4×16-bit pigeonhole banding) is EXACT for
    max_hamming ≤ 3: with 4 bands, ≤3 differing bits leave at least one
    band identical, so the banded join finds EVERY qualifying pair and
    the bit_count verify drops every non-qualifying candidate. (Above
    3 the scheme is deliberately approximate — the recall pytest in
    test_dedup_similarity covers that regime.)"""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "_id long, sh long"
    )
    got = sorted(
        (r["a"], r["b"], r["hamming"])
        for r in D.hamming_band_pairs(df, max_hamming=max_h).collect()
    )
    want = sorted(
        (a, b, bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1"))
        for a in range(len(sigs))
        for b in range(a + 1, len(sigs))
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= max_h
    )
    assert got == want, (max_h, got, want)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_FUZZY_TEXT = st.text(alphabet=st.sampled_from(list("ab c")), min_size=0, max_size=30)


@given(texts=st.lists(_FUZZY_TEXT, min_size=2, max_size=10), cap=st.sampled_from([0, 2, 16]))
@settings(**SETTINGS)
def test_fuzzy_pairs_matches_blocked_levenshtein(spark, texts, cap):
    """fuzzy_pairs equals the brute-force reference computed under the
    SAME blocking contract: pairs whose normalized texts share the
    block_prefix-char prefix, verified with exact Levenshtein ≤ cap.
    The Python reference reimplements normalize (lower, collapse
    whitespace, trim) and the DP independently."""
    import re as _re

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        (r["a"], r["b"], r["edit_distance"])
        for r in D.fuzzy_pairs(
            df, "doc_id", "text", block_prefix=4, max_edit_distance=cap,
            max_block=100,
        ).collect()
    )
    norm = [_re.sub(r"\s+", " ", t.lower()).strip() for t in texts]
    want = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if norm[a][:4] != norm[b][:4]:
                continue
            d = _lev(norm[a], norm[b])
            if d <= cap:
                want.append((a, b, d))
    assert got == sorted(want), (cap, got, want)


_EVT = st.tuples(
    st.integers(min_value=0, max_value=2),            # user
    st.integers(min_value=0, max_value=6_000_000_000),  # ts in µs (~100 min)
)


@given(events=st.lists(_EVT, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_sessionize_matches_python_reference(spark, events):
    """The 30-minute-gap sessionization (lag → flag → running sum) must
    equal a sequential Python walk for ANY event stream — including the
    boundary (a gap of EXACTLY 1800s stays in-session; the rule is
    strictly greater) and µs-grained gaps that a seconds-truncating
    engine would merge wrongly."""
    from ballista_mvp_spark.queries.events import events_sessionize
    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="sess_")
    try:
        df = spark.createDataFrame(
            [
                (i, u, ts)
                for i, (u, ts) in enumerate(events)
            ],
            "event_id long, user_id long, us long",
        ).select(
            "event_id", "user_id",
            (F.col("us") * 1).alias("us"),
            F.timestamp_micros("us").alias("ts"),
            F.lit("view").alias("event_type"),
            F.lit(0.0).alias("value"),
        ).drop("us")
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            r["user_id"]: (r["n_sessions"], r["n_events"], r["max_sess_len"])
            for r in events_sessionize(spark, d).collect()
        }
        # python reference: sort per user by (ts, event_id), walk gaps
        per_user: dict[int, list[tuple[int, int]]] = {}
        for i, (u, ts) in enumerate(events):
            per_user.setdefault(u, []).append((ts, i))
        want = {}
        for u, evs in per_user.items():
            evs.sort()
            sessions, cur = [], 1
            prev = None
            for ts, _ in evs:
                if prev is not None and ts - prev > 1800 * 1_000_000:
                    sessions.append(cur)
                    cur = 1
                elif prev is not None:
                    cur += 1
                prev = ts
            sessions.append(cur)
            want[u] = (len(sessions), len(evs), max(sessions))
        assert got == want, (events, got, want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


_WORD = st.sampled_from([f"t{i}" for i in range(12)])
_TEXT = st.lists(_WORD, min_size=1, max_size=14).map(" ".join)


@given(
    train_texts=st.lists(_TEXT, min_size=0, max_size=8),
    eval_texts=st.lists(_TEXT, min_size=1, max_size=6),
    k=st.sampled_from([1, 2, 3]),
)
@settings(**SETTINGS)
def test_decontaminate_matches_python_set_model(spark, train_texts, eval_texts, k):
    """decontaminate() vs a pure-Python set model on arbitrary corpora:
    per eval doc, n_shingles == |distinct word-k-grams| and
    n_contaminated == |that set ∩ union of train k-gram sets| — for both
    physical plans (bounded-probe broadcast and merge-hinted shuffle
    semi). The tiny 12-word vocabulary forces heavy cross-doc shingle
    collisions, the regime where a fan-out/dedup bug would miscount."""

    def grams(text: str) -> set[tuple[str, ...]]:
        toks = text.split()
        if len(toks) <= k:
            return {tuple(toks)}  # short-document fallback gram
        return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    train_set: set[tuple[str, ...]] = set()
    for t in train_texts:
        train_set |= grams(t)
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "id long, text string"
    ) if train_texts else spark.createDataFrame([], "id long, text string")
    eval_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(eval_texts)], "id long, text string"
    )
    for bounded in (True, False):
        got = {
            r["id"]: (r["n_shingles"], r["n_contaminated"])
            for r in P.decontaminate(
                train, eval_df, "id", "text", shingle_k=k, eval_bounded=bounded
            ).collect()
        }
        for i, t in enumerate(eval_texts):
            g = grams(t)
            want = (len(g), len(g & train_set))
            assert got[100 + i] == want, (bounded, k, t, got[100 + i], want)
