"""Structured Streaming operator tests: batch/stream plan parity, the
stateful sessionization contract, and sliding windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from ballista_mvp_spark.streaming import (
    run_stateful_sessionize_batchfile,
    run_tumbling_batchfile,
    sliding_agg,
    tumbling_agg,
)
from ballista_mvp_spark.tables import load_table

from .conftest import SF_SMALL


def test_tumbling_stream_equals_batch(spark):
    ev = load_table(spark, SF_SMALL, "events")
    batch = {tuple(r) for r in tumbling_agg(ev).collect()}
    stream = {tuple(r) for r in run_tumbling_batchfile(spark, SF_SMALL).collect()}
    assert batch == stream


def test_stateful_sessionize_equals_batch_windows(spark):
    from ballista_mvp_spark.queries.events import events_sessionize

    batch = {
        (r.user_id, r.n_sessions, r.n_events, r.max_sess_len)
        for r in events_sessionize(spark, SF_SMALL).collect()
    }
    stream = {
        (r.user_id, r.n_sessions, r.n_events, r.max_sess_len)
        for r in run_stateful_sessionize_batchfile(spark, SF_SMALL).collect()
    }
    assert batch == stream


def test_sliding_windows_overlap(spark):
    ev = load_table(spark, SF_SMALL, "events")
    tumbling = tumbling_agg(ev, "1 hour").agg(F.sum("n").alias("s")).head().s
    sliding = sliding_agg(ev, "1 hour", "15 minutes").agg(F.sum("n").alias("s")).head().s
    # each event falls in exactly 4 overlapping 1h/15min windows
    assert sliding == 4 * tumbling
