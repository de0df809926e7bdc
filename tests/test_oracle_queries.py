"""End-to-end oracle certification at sf0.001 for every registry query —
the fast mirror of the driver's t2 gate (full-scale run:
``python tools/run_oracle.py /root/testdata/sf0.01``)."""

from __future__ import annotations

import os

import pytest

from ballista_mvp_spark.oracle import compare
from ballista_mvp_spark.queries import ALL_ORACLES, ALL_QUERIES

from .conftest import SF_SMALL

# Default: a fast representative core (one per operator family). The full
# 80-query sweep runs via SPARK_GRAFT_FULL=1 or tools/run_oracle.py (the
# driver-gate mirror) — Spark per-query overhead makes all-by-default too
# slow for an inner-loop suite.
CORE = [
    "tpch_q1", "tpch_q3", "tpch_q6", "tpch_q12", "tpch_q18",
    "projection", "filter_pred", "limit_offset", "sort_nulls",
    "join_left", "join_full", "join_semi", "join_nullsafe", "join_residual",
    "union_all", "intersect_op", "values_inline",
    "agg_basic", "agg_stats", "agg_distinct_filter", "agg_grouping_sets",
    "window_row_number", "window_lag_lead", "window_agg_rows_frame",
    "fn_math", "fn_string", "fn_regex", "fn_datetime", "fn_conditional",
    "events_hourly", "events_sessionize",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_exact", "sim_topk",
    "text_quality", "text_langid", "multimodal_meta", "multimodal_frames",
    "pipeline_split", "pipeline_pack", "text_repetition", "text_tfidf",
    "text_decontaminate", "dedup_clusters", "dedup_spans", "text_gopher",
    "pipeline_mixture", "pipeline_quota", "window_agg_groups_frame",
    "events_funnel", "events_anomaly", "events_cum_users",
    "events_session_window", "sql_tpch_q1",
    # round-3 driver-red rows, re-certified after the output-encoding
    # rewrite (arrays comma-joined / decimals CAST AS STRING) — kept in
    # CORE so a regression to driver-unsafe encodings is caught inner-loop
    "agg_quantiles", "fn_decimal", "fn_map", "fn_higher_order",
    "sim_quantize",
]

NAMES = sorted(ALL_QUERIES) if os.environ.get("SPARK_GRAFT_FULL") else CORE


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, duck_small):
    # strict=True = the driver-faithful pandas canonicalization; the
    # lenient path let 5 array/decimal-output queries through in round 3
    # that the driver then red-flagged (CORRECTNESS_r03).
    res = compare(
        name, ALL_QUERIES[name](spark, SF_SMALL), ALL_ORACLES.get(name),
        duck_small, strict=True,
    )
    assert res.ok, str(res)


def test_registry_shape():
    # every oracle key has a query; contract names are stable
    assert set(ALL_ORACLES) <= set(ALL_QUERIES)
    assert "tpch_q1" in ALL_QUERIES
    # rows-only queries are the documented sketch/nondeterministic set
    rows_only = set(ALL_QUERIES) - set(ALL_ORACLES)
    assert rows_only == {
        "agg_approx",
        "sketch_hll",
        "sketch_hll_windowed",
        "sketch_topk",
        "sketch_cms",
        "dedup_incremental_minhash",
        "dedup_embedding",
        "fn_hash_full",
        "fn_misc",
        "dedup_minhash",
        "dedup_simhash",
        "sim_ann_lsh",
        "sim_ann_pq",
        "sim_ann_ivfpq",
        "sim_ann_ivf",
        "multimodal_features",
        "dedup_semantic",
    }


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) == 6  # Q1 returnflag×linestatus groups
    assert set(E.oracle_sql()) <= set(E.queries())


def test_no_driver_unsafe_output_columns(spark):
    """Registry contract: no oracle-backed query may emit a top-level
    array/map/struct/decimal column. The driver's pandas canonicalization
    crashes on container cells (``unhashable type: 'list'``) and renders
    Decimal engine-dependently — exactly the 5 red rows of
    CORRECTNESS_r03. Queries needing those types must pre-render
    (array_join / to_json / CAST AS STRING) on both engines."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    bad = []
    for name in sorted(ALL_ORACLES):
        schema = ALL_QUERIES[name](spark, SF_SMALL).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType, DecimalType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"driver-unsafe output columns: {bad}"


def test_bench_membership_frozen():
    """BENCH_r01..r04 must stay cross-round comparable: the bench suite's
    membership and order are pinned by hash so a refactor cannot silently
    change what `value` measures (VERDICT r3, next-round #6)."""
    import hashlib

    from bench import BENCH_QUERIES

    digest = hashlib.sha256(",".join(BENCH_QUERIES).encode()).hexdigest()
    assert digest == (
        "efbe756cb92dd942f5ff233360bcaf88d80bc8cf42d09ab6bcea31caa38c4a45"
    ), f"BENCH_QUERIES changed: {digest} — bench membership is frozen across rounds"


def test_registry_contract_hygiene():
    """Every registry entry obeys the driver contract mechanically:
    snake_case name, callable of (spark, sf_dir), oracle values are
    non-empty SELECT/WITH SQL strings."""
    import inspect
    import re

    for name, fn in ALL_QUERIES.items():
        assert re.fullmatch(r"[a-z0-9_]+", name), name
        assert callable(fn), name
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, (name, params)
    for name, sql in ALL_ORACLES.items():
        assert isinstance(sql, str) and sql.strip(), name
        head = sql.strip().split(None, 1)[0].upper()
        assert head in {"SELECT", "WITH"}, (name, head)



def test_round5_window_historical():
    """The round-5 certification window (historical — CORRECTNESS_r05.json:
    50/50 hash-green): 50 unique oracle-backed names, disjoint from the
    round-4 window, and containing every oracle-backed query that lacked
    a driver row after round 4 except the round-5 additions themselves."""
    from ballista_mvp_spark.queries import (
        _CERT_FIRST_ROUND4,
        _CERT_FIRST_ROUND5,
    )

    assert len(_CERT_FIRST_ROUND5) == 50
    assert len(set(_CERT_FIRST_ROUND5)) == 50
    assert set(_CERT_FIRST_ROUND5) <= set(ALL_QUERIES)
    assert set(_CERT_FIRST_ROUND5) <= set(ALL_ORACLES)  # all hash-certifiable
    assert not set(_CERT_FIRST_ROUND5) & set(_CERT_FIRST_ROUND4)
    never_certified = {
        # added mid-round-4
        "text_normalize", "text_line_dedup", "text_dsir",
        "stats_column_profile", "stats_histogram",
        # oracle-backed argued leftovers (COVERAGE.md)
        "agg_minmax_by", "events_attribution", "text_overlap_matrix",
        "sim_hybrid_rrf", "pipeline_group_split", "join_null_skew",
        "sql_tpch_q1", "except_all_op", "dedup_exact_keys",
        "text_fingerprint", "dedup_embedding_exact",
    }
    assert never_certified <= set(_CERT_FIRST_ROUND5)


def test_round6_window_historical():
    """The round-6 certification window (historical — CORRECTNESS_r06.json
    certified all 50 hash-green): EXACTLY the 50 round-5 additions, all
    oracle-backed, no overlap with any earlier window."""
    from ballista_mvp_spark.queries import (
        _CERT_FIRST_ROUND4,
        _CERT_FIRST_ROUND5,
        _CERT_FIRST_ROUND6,
    )

    assert len(_CERT_FIRST_ROUND6) == 50
    assert len(set(_CERT_FIRST_ROUND6)) == 50
    assert set(_CERT_FIRST_ROUND6) <= set(ALL_QUERIES)
    assert set(_CERT_FIRST_ROUND6) <= set(ALL_ORACLES)  # no rows-only entries
    assert not set(_CERT_FIRST_ROUND6) & set(_CERT_FIRST_ROUND4)
    assert not set(_CERT_FIRST_ROUND6) & set(_CERT_FIRST_ROUND5)
    round5_additions = {
        "versioned_update_restore", "versioned_cdf", "streaming_cdc_upsert",
        "stats_mutual_info", "stats_chi2", "sql_qualify",
        "text_script_profile", "text_readability", "text_code_detect",
        "text_phrase_search", "text_ngram_novelty", "pipeline_curriculum",
        "dedup_bloom_gate", "graph_bfs", "events_markov",
        "pipeline_kfold", "stats_ks_test", "stats_mannwhitney",
        "pipeline_temperature", "events_interarrival", "text_entropy",
        "pipeline_dedup_rate", "dedup_minhash_det", "stats_autocorr",
        "events_cohort_matrix", "dedup_simhash_det", "dedup_embedding_det",
        "sketch_cms_det", "sketch_hll_det", "graph_assortativity",
        "pipeline_source_gini", "stats_spearman", "stats_benford",
        "events_heatmap",
        "graph_kcore", "graph_labelprop", "graph_jaccard_links",
        "stats_ttest", "stats_kaplan_meier", "stats_mad",
        "graph_clustering", "stats_anova", "pipeline_rebalance",
        "text_hapax", "events_forecast_naive", "stats_bootstrap",
        "graph_modularity",
        "pipeline_kanon", "text_oov", "sim_centroid_matrix",
    }
    assert set(_CERT_FIRST_ROUND6) == round5_additions


def test_round7_window_historical():
    """The round-7 certification window (historical —
    CORRECTNESS_r07.json: 50/50 hash-green, 45 first-time
    certifications): the remaining 45 never-driver-certified
    oracle-backed queries (34 late-round-5 + 10 late-round-4 +
    text_gopher_funnel) + 5 displaced re-certs — 50 unique
    oracle-backed names overlapping no earlier window."""
    from ballista_mvp_spark.queries import (
        _CERT_FIRST_ROUND4,
        _CERT_FIRST_ROUND5,
        _CERT_FIRST_ROUND6,
        _CERT_FIRST_ROUND7,
    )

    assert len(_CERT_FIRST_ROUND7) == 50
    assert len(set(_CERT_FIRST_ROUND7)) == 50
    assert set(_CERT_FIRST_ROUND7) <= set(ALL_QUERIES)
    assert set(_CERT_FIRST_ROUND7) <= set(ALL_ORACLES)  # no rows-only entries
    assert not set(_CERT_FIRST_ROUND7) & set(_CERT_FIRST_ROUND4)
    assert not set(_CERT_FIRST_ROUND7) & set(_CERT_FIRST_ROUND5)
    assert not set(_CERT_FIRST_ROUND7) & set(_CERT_FIRST_ROUND6)
    late_round5 = {
        "stats_levene", "stats_wilson", "sim_silhouette",
        "graph_reciprocity", "pipeline_dataset_card",
        "events_changepoint", "events_seasonality", "stats_qq",
        "events_time_to_convert", "events_value_deciles",
        "stats_cat_entropy", "graph_ppr", "text_langid_confusion",
        "market_supplier_scorecard", "customer_churn",
        "fn_string_distance", "sim_knn_eval",
        "sql_distinct_on", "stats_outlier_iqr", "text_stopword_density",
        "profile_fd_check", "sim_dedup_threshold_sweep",
        "events_ab_srm", "events_rolling_median", "fn_formatting",
        "dedup_cluster_histogram", "sim_norm_profile",
        "pipeline_ab_power", "text_js_divergence", "events_markov_eval",
        "pipeline_truncation_loss", "dedup_cross_source",
        "agg_salted_skew", "join_salted_skew",
    }
    late_round4 = {
        "market_basket", "customer_rfm", "text_tokens_cjk",
        "graph_components", "events_ab_test", "stats_corr_matrix",
        "text_bpe_merges", "graph_components_twophase",
        "stats_skew_profile", "text_bpe_encode",
    }
    assert late_round5 | late_round4 | {"text_gopher_funnel"} <= set(
        _CERT_FIRST_ROUND7
    )


def test_round8_window_historical():
    """The round-8 certification window (historical —
    CORRECTNESS_r08.json: 50/50 hash-green, 4 first-time
    certifications): front-loaded the 4 never-driver-certified
    oracle-backed queries (3 ANN det twins + dedup_signature_health)
    ahead of 46 re-certifications."""
    from ballista_mvp_spark.queries import (
        _CERT_FIRST_ROUND4,
        _CERT_FIRST_ROUND5,
        _CERT_FIRST_ROUND6,
        _CERT_FIRST_ROUND7,
        _CERT_FIRST_ROUND8,
    )

    # the 4 first-time certs led the window (VERDICT r7 #1)
    assert _CERT_FIRST_ROUND8[:4] == [
        "sim_ann_lsh_det", "sim_ann_ivf_det", "sim_ann_pq_det",
        "dedup_signature_health",
    ]
    assert len(_CERT_FIRST_ROUND8) == 50
    assert len(set(_CERT_FIRST_ROUND8)) == 50
    assert set(_CERT_FIRST_ROUND8) <= set(ALL_QUERIES)
    assert set(_CERT_FIRST_ROUND8) <= set(ALL_ORACLES)  # no rows-only entries
    assert not set(_CERT_FIRST_ROUND8) & set(_CERT_FIRST_ROUND4)
    assert not set(_CERT_FIRST_ROUND8) & set(_CERT_FIRST_ROUND5)
    assert not set(_CERT_FIRST_ROUND8) & set(_CERT_FIRST_ROUND6)
    assert not set(_CERT_FIRST_ROUND8) & set(_CERT_FIRST_ROUND7)


def test_round9_window_historical():
    """The round-9 certification window (historical —
    CORRECTNESS_r09.json: 50/50 hash-green, first-time cert of
    sim_ranking_metrics): the round-4 names minus the banned rows-only
    slot and sim_quantize + agg_cube — 50 unique oracle-backed entries,
    disjoint from the round-5..8 windows. After it, ALL 303
    oracle-backed registry queries are driver-certified."""
    from ballista_mvp_spark.queries import (
        _CERT_FIRST_ROUND4,
        _CERT_FIRST_ROUND5,
        _CERT_FIRST_ROUND6,
        _CERT_FIRST_ROUND7,
        _CERT_FIRST_ROUND8,
        _CERT_FIRST_ROUND9,
    )

    # the last first-time certification is in the window
    assert "sim_ranking_metrics" in _CERT_FIRST_ROUND9
    assert len(_CERT_FIRST_ROUND9) == 50
    assert len(set(_CERT_FIRST_ROUND9)) == 50
    assert set(_CERT_FIRST_ROUND9) <= set(ALL_ORACLES)
    assert "dedup_incremental_minhash" not in _CERT_FIRST_ROUND9
    assert set(_CERT_FIRST_ROUND9) - set(_CERT_FIRST_ROUND4) == {
        "agg_cube", "sim_ranking_metrics"
    }
    assert set(_CERT_FIRST_ROUND4) - set(_CERT_FIRST_ROUND9) == {
        "dedup_incremental_minhash", "sim_quantize"
    }
    for w in (_CERT_FIRST_ROUND5, _CERT_FIRST_ROUND6, _CERT_FIRST_ROUND7,
              _CERT_FIRST_ROUND8):
        assert not set(_CERT_FIRST_ROUND9) & set(w)


def test_round10_window_historical():
    """The round-10 certification window (historical —
    CORRECTNESS_r10.json: 50/50 hash-green): every oracle-backed query
    outside windows 4-9, plus three r3-row re-certs displaced by
    the round-8 re-cut — after it, all oracle-backed queries hold a
    rounds-5-10 driver row (multimodal_meta r2, events_topk_users
    r3/r11 excepted — both already hash-green)."""
    from ballista_mvp_spark.queries import (
        _CERT_FIRST_ROUND4,
        _CERT_FIRST_ROUND5,
        _CERT_FIRST_ROUND6,
        _CERT_FIRST_ROUND7,
        _CERT_FIRST_ROUND8,
        _CERT_FIRST_ROUND9,
        _CERT_FIRST_ROUND10,
    )

    assert len(_CERT_FIRST_ROUND10) == 50
    assert len(set(_CERT_FIRST_ROUND10)) == 50
    assert set(_CERT_FIRST_ROUND10) <= set(ALL_ORACLES)
    used = (set(_CERT_FIRST_ROUND4) | set(_CERT_FIRST_ROUND5)
            | set(_CERT_FIRST_ROUND6) | set(_CERT_FIRST_ROUND7)
            | set(_CERT_FIRST_ROUND8) | set(_CERT_FIRST_ROUND9))
    # no overlap with windows 4-9
    assert not set(_CERT_FIRST_ROUND10) & used
    # the displaced round-8 re-certs landed here
    assert {
        "fn_url", "window_ntile", "window_running_total"
    } <= set(_CERT_FIRST_ROUND10)
    # completeness: windows 4-10 + rows-only = the whole registry.
    # Allowed absentees: multimodal_meta (already holds an r2 hash-green
    # driver row, CORRECTNESS_r02.json; yielded its round-10 slot in the
    # original staging) and events_topk_users (r3 hash-green driver
    # row; its re-cert slot was displaced by the round-8 re-cut and
    # rotates into the ROUND-11 window,
    # test_round11_12_window_prestage).
    leftover = set(ALL_ORACLES) - used - set(_CERT_FIRST_ROUND10)
    assert leftover <= {"multimodal_meta", "events_topk_users"}, (
        f"oracle-backed queries in no window: {leftover}"
    )


def test_round11_window_historical():
    """The round-11 certification window (historical —
    CORRECTNESS_r11.json: 50/50 hash-green): the round-5 window with
    exactly one slot swapped — events_topk_users (whose re-cert slot
    was displaced by the round-8 re-cut; its r3 driver row was the
    stalest in the ledger) displaced the twice-proven tpch_q13. 50
    unique oracle-backed entries, no rows-only member."""
    from ballista_mvp_spark.queries import (
        _CERT_FIRST_ROUND5,
        _CERT_FIRST_ROUND11,
    )

    assert set(_CERT_FIRST_ROUND11) - set(_CERT_FIRST_ROUND5) == {
        "events_topk_users"
    }
    assert set(_CERT_FIRST_ROUND5) - set(_CERT_FIRST_ROUND11) == {"tpch_q13"}
    assert len(_CERT_FIRST_ROUND11) == 50
    assert len(set(_CERT_FIRST_ROUND11)) == 50
    assert set(_CERT_FIRST_ROUND11) <= set(ALL_ORACLES)


def test_round12_window_active():
    """The round-12 certification window (ACTIVE — swapped in at
    round-12 start per VERDICT r11 next-round #2, after
    CORRECTNESS_r11.json landed 50/50): the round-6 window verbatim
    (50 unique oracle-backed entries, no rows-only member) — the
    post-round-10 treadmill that re-proves every earlier driver row
    under the then-final engine."""
    from ballista_mvp_spark.queries import (
        _CERT_FIRST,
        _CERT_FIRST_ROUND6,
        _CERT_FIRST_ROUND12,
    )

    assert _CERT_FIRST is _CERT_FIRST_ROUND12  # the swap happened
    assert list(ALL_QUERIES)[:50] == _CERT_FIRST_ROUND12  # driver sees it
    assert _CERT_FIRST_ROUND12 == _CERT_FIRST_ROUND6
    assert len(_CERT_FIRST_ROUND12) == 50
    assert len(set(_CERT_FIRST_ROUND12)) == 50
    assert set(_CERT_FIRST_ROUND12) <= set(ALL_ORACLES)


def test_round13_window_prestage():
    """The pre-staged round-13 re-certification window (VERDICT r10 #9):
    the round-7 window with exactly one slot swapped — multimodal_meta
    (the registry's last r2-era row) displaces agg_basic (r1 + r7 rows,
    family re-proven r10). 50 unique oracle-backed entries, no
    rows-only member."""
    from ballista_mvp_spark.queries import (
        _CERT_FIRST_ROUND7,
        _CERT_FIRST_ROUND13,
    )

    assert set(_CERT_FIRST_ROUND13) - set(_CERT_FIRST_ROUND7) == {
        "multimodal_meta"
    }
    assert set(_CERT_FIRST_ROUND7) - set(_CERT_FIRST_ROUND13) == {"agg_basic"}
    assert len(_CERT_FIRST_ROUND13) == 50
    assert len(set(_CERT_FIRST_ROUND13)) == 50
    assert set(_CERT_FIRST_ROUND13) <= set(ALL_ORACLES)


def test_q11_spec_variant_matches_duckdb(spark, duck_small):
    """The spec-faithful Q11 threshold variant (fraction = 0.0001/SF,
    TPC-H 2.18 §B.11) value-matches DuckDB. The SPEC fraction is empty
    on the synthetic proxy at every sf (measured in the docstring), so
    the value check runs at fraction=0.005 (98 rows at sf0.001) and a
    second assertion pins the documented emptiness of the spec default."""
    from ballista_mvp_spark.oracle import compare
    from ballista_mvp_spark.queries.tpch import q11_spec

    sql = """
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS vc
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1)
    SELECT l_partkey, vc / 100.0 AS part_value
    FROM rev
    WHERE vc > (SELECT sum(vc) FROM rev) * 0.005
    ORDER BY part_value DESC, l_partkey
    """
    res = compare(
        "q11_spec",
        q11_spec(spark, SF_SMALL, fraction=0.005),
        sql,
        duck_small,
        strict=True,
    )
    assert res.ok, str(res)
    # the spec default (0.0001/SF -> 0.1 at sf0.001) is empty on this
    # proxy — which is exactly why it is NOT a registry/driver query
    assert q11_spec(spark, SF_SMALL).count() == 0
    # a non-'sf<float>' data dir (e.g. a tools/tpch_scale.py temp
    # instance) cannot derive the spec fraction — the error must be
    # actionable, not a bare float() ValueError (ADVICE r8)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fraction= explicitly"):
        q11_spec(spark, "/tmp/tpch_dim_abc123")
