"""Interleaved A/B of AQE coalescing knobs at bench scale (VERDICT r9 #3).

Round 9's broadcast policy (static threshold off, AQE runtime threshold)
costs ~+0.66 s warm on the sf0.1 suite, concentrated on TPC-H dim-join
members — the AQE materialize-then-convert step. This script measures
whether AQE coalescing knobs claw any of it back WITHOUT reopening the
OOM hole (the broadcast policy itself is untouched):

  B-variant:
    spark.sql.adaptive.coalescePartitions.parallelismFirst=false
        (Spark's own docs recommend false — respect the advisory target
        size instead of exploding to default parallelism, so the tiny
        post-shuffle stages at bench scale coalesce to fewer tasks)
    spark.sql.adaptive.coalescePartitions.minPartitionSize=4m
        (default 1m; raises the floor for the same reason)

Both knobs are RUNTIME-settable, so A and B interleave in one session
per query (best-of-3 each) and host state cancels — the PERF.md r9 A/B
discipline. Decision rule: adopt if total ratio <= 0.95, reject
otherwise; either way the pair lands in PERF.md.

Usage: python tools/ab_knobs.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ballista_mvp_spark.queries import ALL_QUERIES  # noqa: E402
from ballista_mvp_spark.session import build_session  # noqa: E402

MEMBERS = [
    "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q7", "tpch_q8",
    "tpch_q10", "tpch_q12", "dedup_minhash", "events_sessionize",
]

A_CONF = {
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
}
B_CONF = {
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4m",
}


def run_once(spark, sf_dir: str, name: str) -> float:
    t = time.time()
    ALL_QUERIES[name](spark, sf_dir).collect()
    return time.time() - t


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("ab-knobs")
    run_once(spark, sf_dir, "count_star")  # JIT warm
    print(f"loadavg at start: {os.getloadavg()}")
    tot_a = tot_b = 0.0
    for name in MEMBERS:
        best = {"A": float("inf"), "B": float("inf")}
        for _ in range(3):
            for tag, conf in (("A", A_CONF), ("B", B_CONF)):
                for k, v in conf.items():
                    spark.conf.set(k, v)
                best[tag] = min(best[tag], run_once(spark, sf_dir, name))
        tot_a += best["A"]
        tot_b += best["B"]
        print(f"{name:22s} A={best['A']:.3f}  B={best['B']:.3f}  "
              f"ratio={best['B'] / best['A']:.3f}")
    print(f"{'TOTAL':22s} A={tot_a:.3f}  B={tot_b:.3f}  ratio={tot_b / tot_a:.3f}")
    print(f"loadavg at end: {os.getloadavg()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
