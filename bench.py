"""Benchmark harness — the driver runs this per-round and records the JSON
line against BASELINE.md (within-2× gate at sf0.1; BASELINE.md §"Operative
baseline").

Headline set: the reference's canonical TPC-H queries (Q1/Q12 are its own
plan-test queries, planner.rs:257-513) + the join/agg-heavy adaptations +
one representative of each extension family (dedup sketch, ANN, text,
events). Each query is timed end-to-end (plan + execute + collect) on a
warm session; SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS override data and
parallelism.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ballista_mvp_spark.queries import ALL_QUERIES  # noqa: E402
from ballista_mvp_spark.session import build_session  # noqa: E402

BENCH_QUERIES = [
    "count_star",
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q12",
    "tpch_q14",
    "tpch_q18",
    "agg_grouping_sets",
    "window_row_number",
    "events_hourly",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash",
    "sim_topk",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = build_session("bench")
    # warm the JVM/codegen path once so per-query times measure the engine,
    # not JIT warmup
    ALL_QUERIES["count_star"](spark, sf_dir).collect()

    # Two passes per query. Pass 1 (cold) includes Catalyst planning +
    # whole-stage-codegen compilation of each distinct plan — the headline
    # `value`, methodology-identical across rounds. Pass 2 (warm) hits
    # Spark's generated-class cache and measures steady-state engine
    # throughput — the number that projects to a long-lived cluster where
    # each plan compiles once and runs thousands of times.
    times: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        ALL_QUERIES[name](spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 3)
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        ALL_QUERIES[name](spark, sf_dir).collect()
        warm[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_warm": warm,
                "warm_suite_seconds": round(sum(warm.values()), 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
