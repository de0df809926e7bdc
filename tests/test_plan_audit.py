"""Unit tests for the plan-hygiene audit (tools/plan_audit.py).

The audit is the mechanical check behind the COVERAGE.md plan-hygiene
sweep: pinned broadcasts classified by the hinted frame's true scale,
CartesianProduct detection, and the SinglePartition-above-aggregate
invariant. The vocab_scale class exists because the round-7 ad-hoc
audit miscounted tfidf's document-frequency table as dimension-sized
(VERDICT r7 #3): ANY frame derived by grouping an exploded
token/term/shingle column is vocabulary-sized and must never carry a
broadcast pin.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from plan_audit import (  # noqa: E402
    ADJUDICATED_KEYED_AGG_PINS,
    ADJUDICATED_SCALED_PINS,
    ADJUDICATED_VOCAB_PINS,
    audit_query,
    flags_for,
    parse_tree,
)

from ballista_mvp_spark.operators import dedup as D  # noqa: E402
from ballista_mvp_spark.operators.text import tokens  # noqa: E402
from ballista_mvp_spark.queries import ALL_QUERIES  # noqa: E402
from ballista_mvp_spark.tables import load_table  # noqa: E402

from .conftest import SF_SMALL


def _tf(docs):
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def test_parse_tree_handles_embedded_newlines(spark):
    """Expression trees can embed literal newlines (the tokenizer's
    whitespace-class split regex does); continuation lines must fold
    into their node instead of corrupting the child links."""
    docs = load_table(spark, SF_SMALL, "documents")
    tf = _tf(docs)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    opt = tf.join(dfreq, "term")._jdf.queryExecution().optimizedPlan().toString()
    nodes = parse_tree(opt)
    joins = [n for n in nodes if n.text.startswith("Join ")]
    assert joins and all(len(j.children) == 2 for j in joins), [
        (j.text[:60], len(j.children)) for j in joins
    ]


def test_audit_flags_pinned_vocabulary_broadcast(spark):
    """The reconstructed round-7 tfidf defect: F.broadcast on a frame
    built by grouping an exploded token column → vocab_scale."""
    docs = load_table(spark, SF_SMALL, "documents")
    tf = _tf(docs)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    res = audit_query(tf.join(F.broadcast(dfreq), "term"))
    assert [c for c, _ in res["pins"]] == ["vocab_scale"]
    assert res["vocab_pins"]


def test_audit_allows_bounded_and_dimension_pins(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    tf = _tf(docs)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    # k-row bounded vocabulary slice: fine
    topv = dfreq.orderBy(F.col("df_t").desc(), "term").limit(10)
    res = audit_query(tf.join(F.broadcast(topv), "term"))
    assert [c for c, _ in res["pins"]] == ["limited"]
    # 1-row global aggregate: fine
    nd = docs.agg(F.count("*").alias("_nd"))
    res = audit_query(tf.crossJoin(F.broadcast(nd)))
    assert [c for c, _ in res["pins"]] == ["one_row_agg"]
    # base dimension table: fine (listed, not flagged)
    nat = load_table(spark, SF_SMALL, "nation")
    cust = load_table(spark, SF_SMALL, "customer")
    res = audit_query(cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey))
    assert [c for c, _ in res["pins"]] == ["dimension"]
    assert not res["vocab_pins"] and not res["cartesian"]


def test_audit_detects_cartesian(spark):
    a = spark.range(100).toDF("a")
    b = spark.range(100).toDF("b")
    # force the CartesianProduct strategy (small frames would otherwise
    # plan as BroadcastNestedLoopJoin, which the audit allows)
    res = audit_query(a.crossJoin(b.hint("shuffle_replicate_nl")))
    assert res["cartesian"]


def test_registry_tfidf_bigram_bm25_unpinned(spark):
    """The vocabulary-join operators carry no vocab-scale pin: tfidf's
    df table (the round-7 finding), the bigram LM's count tables,
    BM25's per-term df, and the shingle-index stop-key anti-join (hot
    sets are O(n/cap) worst-case) are all keyed joins AQE plans."""
    from ballista_mvp_spark.operators import pipeline as P
    from ballista_mvp_spark.operators import text as TX

    docs = load_table(spark, SF_SMALL, "documents")
    for df in (
        P.tfidf_topk(docs, "doc_id", "text", k=3),
        TX.bigram_cross_entropy(docs, "doc_id", "text"),
        TX.bm25_topk(docs, "doc_id", "text", ["spark", "vector"], k=5),
        D.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=3),
    ):
        res = audit_query(df)
        assert not res["vocab_pins"], res["pins"]


def test_adjudicated_pins_documented():
    """Every adjudicated pin (vocab-scale, SF-scaled-base, keyed-agg)
    names a registry query and a concrete bound; no free passes."""
    for d in (ADJUDICATED_VOCAB_PINS, ADJUDICATED_SCALED_PINS,
              ADJUDICATED_KEYED_AGG_PINS):
        for name, reason in d.items():
            assert name in ALL_QUERIES, name
            assert len(reason) > 20, (name, reason)


def test_dsir_ratio_pin_is_adjudicated(spark):
    """dsir's ratio-table pin classifies vocab_scale structurally but is
    V+1-bounded by the vocab Limit — it must be in the adjudication
    list, not silently passed."""
    from ballista_mvp_spark.operators import text as TX

    docs = load_table(spark, SF_SMALL, "documents")
    res = audit_query(
        TX.dsir_logweights(docs, "doc_id", "text", F.col("source") == "src0")
    )
    if res["vocab_pins"]:
        assert "text_dsir" in ADJUDICATED_VOCAB_PINS


# Inner-loop plan-hygiene gate: the CORE operator-family sample (the
# same philosophy as test_oracle_queries.CORE — the full 319 runs via
# `python tools/plan_audit.py`), plus — derived mechanically, so the
# set cannot drift — EVERY query carrying an adjudicated pin: a
# regression in an adjudicated plan (a second, unadjudicated pin class
# appearing) is caught where its adjudication lives.
_AUDIT_CORE = sorted(
    {
        "tpch_q1", "tpch_q3", "tpch_q9", "tpch_q18", "tpch_q20",
        "join_left", "agg_basic", "window_row_number",
        "dedup_exact", "dedup_minhash_det", "dedup_ngram_jaccard",
        "text_bigram_lm", "pipeline_pack",
        "graph_assortativity", "stats_spearman",
        "market_supplier_scorecard", "customer_churn",
    }
    | set(ADJUDICATED_VOCAB_PINS)
    | set(ADJUDICATED_SCALED_PINS)
    | set(ADJUDICATED_KEYED_AGG_PINS)
)


@pytest.mark.parametrize("name", _AUDIT_CORE)
def test_plan_hygiene_core(name, spark):
    """No unadjudicated pin class, no cartesian, no bare SinglePartition
    in the CORE sample — the mechanical inner-loop mirror of the
    full-registry `python tools/plan_audit.py` sweep."""
    res = audit_query(ALL_QUERIES[name](spark, SF_SMALL))
    bad, _ = flags_for(name, res)
    assert not bad, bad


# --- adjudication bound enforcement (round 11: the stream_plan_audit S2
# documented->enforced upgrade extended to audit A) ----------------------


def test_bound_validators_cover_only_adjudicated_names():
    """Every bound validator targets a name that actually appears in an
    adjudication dict — a validator for an un-adjudicated name is dead
    code and a sign the dicts drifted."""
    from plan_audit import (
        ADJUDICATED_KEYED_AGG_PINS,
        ADJUDICATED_SCALED_PINS,
        ADJUDICATED_VOCAB_PINS,
        ADJUDICATION_BOUND_VALIDATORS,
    )

    adjudicated = (
        set(ADJUDICATED_KEYED_AGG_PINS)
        | set(ADJUDICATED_SCALED_PINS)
        | set(ADJUDICATED_VOCAB_PINS)
    )
    assert set(ADJUDICATION_BOUND_VALIDATORS) <= adjudicated


def test_shipped_bounds_hold(spark):
    """Positive control: every validator passes on its query's shipped
    plan against the audited dataset."""
    from plan_audit import ADJUDICATION_BOUND_VALIDATORS, bound_violations

    from ballista_mvp_spark.queries import ALL_QUERIES

    for name in ADJUDICATION_BOUND_VALIDATORS:
        res = audit_query(ALL_QUERIES[name](spark, SF_SMALL))
        assert bound_violations(name, res, spark, SF_SMALL) == [], name


def test_spec_domain_bound_rejects_grown_domain(spark, tmp_path):
    """Negative control: a dataset whose o_orderpriority cardinality
    exceeds the 5 spec values violates the keyed-agg bound."""
    from plan_audit import _PRIORITY_DOMAIN

    fake_sf = tmp_path / "sf"
    fake_sf.mkdir()
    spark.createDataFrame(
        [(i, f"{i}-PRIO") for i in range(9)],
        "o_orderkey long, o_orderpriority string",
    ).write.parquet(str(fake_sf / "orders.parquet"))
    err = _PRIORITY_DOMAIN(spark, str(fake_sf), {})
    assert err is not None and "9 > 5" in err, err


def test_query_side_bound_rejects_corpus_side_pin(spark):
    """Negative control: pinning the CORPUS side of a similarity join
    (no vec_id filter on the pinned subtree) violates the query-side
    adjudication and must flag."""
    from plan_audit import _query_side_pin_validator

    from ballista_mvp_spark.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    # WRONG shape: the corpus side carries the broadcast pin
    j = F.broadcast(emb).crossJoin(queries)
    res = audit_query(j)
    err = _query_side_pin_validator(spark, SF_SMALL, res)
    assert err is not None and "corpus-side pin" in err, err
    # RIGHT shape: the filtered query side carries it
    ok = emb.crossJoin(F.broadcast(queries))
    res_ok = audit_query(ok)
    assert _query_side_pin_validator(spark, SF_SMALL, res_ok) is None


def test_bucket_id_bound_rejects_data_keyed_pin(spark):
    """Negative control for the rank-percentile adjudication (r11,
    re-keyed r12): the pinned offsets aggregate must be keyed on the
    clamped deterministic bucket id (least(32·defaultParallelism − 1,
    FLOOR(...))); re-keying it onto an unclamped DATA column
    (unbounded domain) must flag, and the shipped stats_histogram
    shape must pass."""
    from plan_audit import _bucket_id_key_validator

    from ballista_mvp_spark.queries import ALL_QUERIES
    from ballista_mvp_spark.tables import load_table

    # WRONG shape: keyed aggregate over the scaled scan on a data column
    li = load_table(spark, SF_SMALL, "lineitem")
    bad_offs = li.groupBy("l_partkey").agg(F.count("*").alias("_c"))
    j = li.join(F.broadcast(bad_offs), "l_partkey")
    res = audit_query(j)
    assert any(c == "keyed_agg_scaled" for c, _ in res["pins"]), res["pins"]
    err = _bucket_id_key_validator(spark, SF_SMALL, res)
    assert err is not None and "bucket id" in err, err

    # RIGHT shape: the shipped query's pin passes its own validator
    res_ok = audit_query(ALL_QUERIES["stats_histogram"](spark, SF_SMALL))
    assert any(c == "keyed_agg_scaled" for c, _ in res_ok["pins"])
    assert _bucket_id_key_validator(spark, SF_SMALL, res_ok) is None
