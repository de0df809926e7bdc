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
    audit_query,
    broadcast_pin_findings,
    flags_for,
    parse_tree,
)

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
    df table (the round-7 finding), the bigram LM's unigram
    denominator, BM25's per-term df, and the dedup stop-key anti-joins
    (hot sets are O(n/cap) worst-case) are all keyed joins AQE plans."""
    from ballista_mvp_spark.operators import pipeline as P

    docs = load_table(spark, SF_SMALL, "documents")
    res = audit_query(P.tfidf_topk(docs, "doc_id", "text", k=3))
    assert not res["vocab_pins"], res["pins"]


def test_adjudicated_pins_documented():
    """Every adjudicated pin (vocab-scale, SF-scaled-base, keyed-agg)
    names a registry query and a concrete bound; no free passes."""
    from plan_audit import (
        ADJUDICATED_KEYED_AGG_PINS,
        ADJUDICATED_SCALED_PINS,
        ADJUDICATED_VOCAB_PINS,
    )

    from ballista_mvp_spark.queries import ALL_QUERIES

    for d in (ADJUDICATED_VOCAB_PINS, ADJUDICATED_SCALED_PINS,
              ADJUDICATED_KEYED_AGG_PINS):
        for name, reason in d.items():
            assert name in ALL_QUERIES, name
            assert len(reason) > 20, (name, reason)


def test_dsir_ratio_pin_is_adjudicated(spark):
    """dsir's ratio-table pin classifies vocab_scale structurally but is
    V+1-bounded by the vocab Limit — it must be in the adjudication
    list, not silently passed."""
    from plan_audit import ADJUDICATED_VOCAB_PINS

    from ballista_mvp_spark.operators import text as TX

    docs = load_table(spark, SF_SMALL, "documents")
    res = audit_query(
        TX.dsir_logweights(docs, "doc_id", "text", F.col("source") == "src0")
    )
    if res["vocab_pins"]:
        assert "text_dsir" in ADJUDICATED_VOCAB_PINS


# Inner-loop plan-hygiene gate: the CORE operator-family sample (the
# same philosophy as test_oracle_queries.CORE — the full 319 runs via
# `python tools/plan_audit.py`), plus every query carrying an
# adjudicated pin so a regression in an adjudicated plan is caught
# where its adjudication lives.
_AUDIT_CORE = [
    "tpch_q1", "tpch_q3", "tpch_q9", "tpch_q18", "tpch_q20",
    "join_inner", "join_left", "agg_basic", "window_row_number",
    "dedup_exact", "dedup_minhash_det", "dedup_ngram_jaccard",
    "sim_topk", "sim_ann_pq_det", "text_tfidf", "text_dsir",
    "text_bigram_lm", "sim_hybrid_rrf", "pipeline_pack",
    "pipeline_budget", "events_anomaly", "graph_assortativity",
    "stats_spearman", "market_supplier_scorecard", "customer_churn",
]


@pytest.mark.parametrize("name", _AUDIT_CORE)
def test_plan_hygiene_core(name, spark):
    """No unadjudicated pin class, no cartesian, no bare SinglePartition
    in the CORE sample — the mechanical inner-loop mirror of the
    full-registry `python tools/plan_audit.py` sweep."""
    res = audit_query(ALL_QUERIES[name](spark, SF_SMALL))
    bad, _ = flags_for(name, res)
    assert not bad, bad
