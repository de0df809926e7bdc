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


def _machine_state() -> dict:
    """Contention evidence recorded with every run (VERDICT r5 #3): three
    driver rounds of cold-total drift (18.5 -> 21.4 -> 22.5 s) were each
    adjudicated as shared-box load from prose in PERF.md; these fields
    make the claim readable out of the JSON itself."""
    state: dict = {}
    try:
        state["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as f:
            mem = {l.split(":")[0]: l.split()[1] for l in f if ":" in l}
        state["page_cache_gib"] = round(int(mem.get("Cached", 0)) / 2**20, 2)
        state["mem_available_gib"] = round(
            int(mem.get("MemAvailable", 0)) / 2**20, 2
        )
    except (OSError, ValueError):
        pass
    return state


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    machine_before = _machine_state()
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
    # `value` stays the cold total so BENCH_r01..rN remain directly
    # comparable; `warm_suite_seconds` is the CROSS-ROUND HEADLINE for
    # plan-regression reads (cold carries +-2 s of JIT-compile noise that
    # run order alone moves — VERDICT r5 "Performance"). The machine_*
    # fields are the contention evidence for adjudicating cold drift.
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_warm": warm,
                "warm_suite_seconds": round(sum(warm.values()), 3),
                "warm_is_cross_round_headline": True,
                "machine_before": machine_before,
                "machine_after": _machine_state(),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
