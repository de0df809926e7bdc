"""Time every registry query at a given SF — the round-11 optimization
census (guide §1.1: empirical loop; find where the time actually goes
across ALL 320 declared queries, not just the 20 bench members).

Methodology matches bench.py (collect on a warm session, cold pass =
plan+codegen+execute, warm pass = steady-state) so numbers are
comparable with BENCH history. Usage:

    python tools/time_all.py [--sf-dir /root/testdata/sf0.1] [--out /tmp/x.json]
        [--only name1,name2] [--warm-passes 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ballista_mvp_spark.queries import ALL_QUERIES  # noqa: E402
from ballista_mvp_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/time_all.json")
    ap.add_argument("--only", default="")
    ap.add_argument("--warm-passes", type=int, default=1)
    args = ap.parse_args()

    names = [n for n in ALL_QUERIES if not args.only or n in set(args.only.split(","))]
    spark = build_session("time-all")
    ALL_QUERIES["count_star"](spark, args.sf_dir).collect()  # JIT warmup

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"cold:{name}")
        t0 = time.perf_counter()
        try:
            ALL_QUERIES[name](spark, args.sf_dir).collect()
            cold[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — census must survive one bad query
            errs[name] = f"{type(e).__name__}: {e}"[:300]
            continue
        best = float("inf")
        for _ in range(args.warm_passes):
            spark.sparkContext.setJobDescription(f"warm:{name}")
            t0 = time.perf_counter()
            ALL_QUERIES[name](spark, args.sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        warm[name] = round(best, 3)
        print(f"{name:40s} cold={cold[name]:7.3f} warm={warm[name]:7.3f}", file=sys.stderr)

    out = {
        "sf_dir": args.sf_dir,
        "cold": cold,
        "warm": warm,
        "errors": errs,
        "cold_total": round(sum(cold.values()), 3),
        "warm_total": round(sum(warm.values()), 3),
        "loadavg": list(os.getloadavg()),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"cold_total": out["cold_total"], "warm_total": out["warm_total"], "n": len(cold), "errors": len(errs)}))


if __name__ == "__main__":
    main()
