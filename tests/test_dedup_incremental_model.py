"""Model-based property tests for the INCREMENTAL dedup ingestion
protocol (round 11: the split-invariance methodology extended to the
batch ingestion operators — the streaming twin is
tests/test_streaming_model.py::test_neardedup_ingest_*).

The long-lived-corpus protocol under test: documents arrive in batches;
each batch is checked against the ACCEPTED corpus so far
(operators/dedup.incremental_dedup / incremental_minhash_dedup — the
corpus side is survivors only, never re-scanned corpus-vs-corpus), and
the batch's survivors extend the corpus. For ANY contiguous in-order
split of the same arrival sequence the final accepted set must equal
the sequential model: first arrival (min id) per exact key / per
near-dup cluster — whether a duplicate pair met inside one batch
(within-batch min-id) or across batches (corpus probe). A violation is
a real protocol bug (state leaking across the batch boundary), exactly
the class the streaming model suite caught in round 10.

Reference parity: the reference's dedup story is batch re-runs; the
incremental protocol is this repo's pipeline extension (SURVEY.md
LLM-data ops), so the model here is the primary correctness evidence
for the cross-batch path (the registry queries dedup_incremental /
dedup_incremental_minhash each exercise ONE batch against a fixed
corpus slice).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ballista_mvp_spark.operators import dedup as D

# 12 docs over 5 exact-key groups; ids = arrival order. Keys repeat at
# varying distances so duplicates land both within and across batches
# for most splits.
_KEYS = ["k0", "k1", "k0", "k2", "k1", "k3", "k0", "k4", "k2", "k3", "k1", "k0"]
_EPOOL = list(enumerate(_KEYS))  # (doc_id, key)

_ECUTS = st.lists(
    st.integers(min_value=1, max_value=len(_EPOOL) - 1), unique=True, max_size=3
).map(sorted)


def _echunks(cuts: list[int]) -> list[list[tuple]]:
    edges = [0, *cuts, len(_EPOOL)]
    return [_EPOOL[a:b] for a, b in zip(edges, edges[1:]) if b > a]


@given(cuts=_ECUTS)
@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_incremental_ingest_matches_model_under_any_split(spark, cuts):
    """Exact incremental ingestion: for every in-order split, (a) each
    batch row's status matches the sequential model (dup_corpus if the
    key was accepted before this batch; dup_batch if a smaller id in
    THIS batch shares it; new otherwise), (b) the final accepted corpus
    is exactly first-arrival-per-key."""
    corpus_rows: list[tuple] = []  # accepted (doc_id, key)
    seen_keys: set[str] = set()  # model: keys accepted before current batch
    schema = "doc_id long, k string"
    for batch in _echunks(cuts):
        bdf = spark.createDataFrame(batch, schema)
        cdf = spark.createDataFrame(corpus_rows, schema)
        out = {
            r["doc_id"]: r["status"]
            for r in D.incremental_dedup(cdf, bdf, F.col("k"), "doc_id").collect()
        }
        batch_min: dict[str, int] = {}
        for i, k in batch:
            batch_min.setdefault(k, i)
        for i, k in batch:
            if k in seen_keys:
                expected = "dup_corpus"
            elif i > batch_min[k]:
                expected = "dup_batch"
            else:
                expected = "new"
            assert out[i] == expected, (cuts, i, k, out[i], expected)
        accepted = [(i, k) for i, k in batch if out[i] == "new"]
        corpus_rows.extend(accepted)
        seen_keys.update(k for _i, k in accepted)
    first_per_key: dict[str, int] = {}
    for i, k in _EPOOL:
        first_per_key.setdefault(k, i)
    assert {i for i, _k in corpus_rows} == set(first_per_key.values()), cuts


# near-dup pool: 10 docs over 4 exact-duplicate clusters with disjoint
# vocabularies (identical shingle sets -> identical signatures -> LSH
# fires deterministically, jaccard 1.0; cross-cluster jaccard 0) — the
# same construction the streaming near-dedup model uses.
_VOCABS = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4,
    "one two three four five six seven eight nine ten " * 4,
    "red orange yellow green blue indigo violet pink brown grey " * 4,
    "north south east west up down left right front back " * 4,
]
_NDOCS = [(i, _VOCABS[c]) for i, c in enumerate([0, 1, 0, 2, 1, 0, 3, 2, 1, 3])]
_NCUTS = st.lists(
    st.integers(min_value=1, max_value=len(_NDOCS) - 1), unique=True, max_size=3
).map(sorted)


@given(cuts=_NCUTS)
@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_neardup_incremental_ingest_matches_model_under_any_split(spark, cuts):
    """Near-dup incremental ingestion protocol: per batch, drop every
    doc flagged against the accepted corpus (incremental_minhash_dedup
    probe) OR having a smaller-id near-dup within the batch
    (minhash_lsh_pairs); survivors extend the corpus. Final corpus =
    min doc per duplicate cluster for EVERY in-order split."""
    schema = "doc_id long, text string"
    edges = [0, *cuts, len(_NDOCS)]
    corpus_rows: list[tuple] = []
    for a, b in zip(edges, edges[1:]):
        batch = _NDOCS[a:b]
        if not batch:
            continue
        bdf = spark.createDataFrame(batch, schema)
        cdf = spark.createDataFrame(corpus_rows, schema)
        flagged = {
            r["batch_id"]
            for r in D.incremental_minhash_dedup(
                cdf, bdf, "doc_id", "text", num_hashes=16, bands=4
            ).collect()
        }
        within = {
            r["b"]
            for r in D.minhash_lsh_pairs(
                bdf, "doc_id", "text", num_hashes=16, bands=4
            ).collect()
        }
        corpus_rows.extend(
            (i, t) for i, t in batch if i not in flagged and i not in within
        )
    first_per_text: dict[str, int] = {}
    for i, t in _NDOCS:
        first_per_text.setdefault(t, i)
    assert {i for i, _t in corpus_rows} == set(first_per_text.values()), (
        cuts, sorted(i for i, _t in corpus_rows)
    )
