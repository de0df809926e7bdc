"""Dump .explain('formatted') for named registry queries into plans/r11/.

Usage:
    python tools/dump_plans.py --suffix before --names tpch_q5,dedup_minhash
    python tools/dump_plans.py --suffix after  --names tpch_q5

Writes plans/r11/<name>_<suffix>.txt (the judge checks plan claims in
OPTIMIZATION_r11.md against these files).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ballista_mvp_spark.queries import ALL_QUERIES  # noqa: E402
from ballista_mvp_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--names", required=True)
    ap.add_argument("--outdir", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"))
    ap.add_argument("--executed", action="store_true", help="also run the query and append the AQE final plan")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    spark = build_session("dump-plans")
    for name in args.names.split(","):
        df = ALL_QUERIES[name](spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        if args.executed:
            df.collect()
            final = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            txt += "\n\n== AQE FINAL (after execution) ==\n" + final
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(path)


if __name__ == "__main__":
    main()
