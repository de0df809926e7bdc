"""Extension-family train-side scale check for text_decontaminate:
grow the TRAIN corpus with shingles DISJOINT from every eval shingle
(result invariant by construction) and verify the executed plan never
broadcasts the corpus-derived side.

Usage: python tools/decon_scale.py [mults...]   (default: 0 1 4 16 64)

Methodology (the tools/tpch_scale.py --dim pattern, extended beyond
TPC-H per VERDICT r8 next-round #3): each multiplier builds a temp
documents instance = the real sf0.01 corpus + mult x 16k SYNTHETIC
train documents under source='synth', whose 40 tokens are globally
unique strings ('zq<docid>x<j>') — so every one of their ~33 word-8-gram
shingles per doc is new, DISJOINT from every src0 eval shingle, and the
per-eval-doc contamination output is unchanged by construction (a
never-matching shingle cannot flip a probe hit).

WHAT THE FIRST RUN FOUND (round 9, the motivating defect): the original
shape — eval shingles LEFT SEMI JOIN train distinct shingles, un-hinted
— did NOT degrade gracefully. Catalyst's size estimate for an
explode+distinct over a small parquet file never grows with the real
shingle count, so the planner statically chose BroadcastHashJoin on the
CORPUS side and AQE never demoted it: still broadcasting at mult 64
(~34M distinct shingles, ~0.3 GB hashed relation), then 'Not enough
memory to build and broadcast' at mult 128 (~67M) on a 16g driver. No
flip, just death — the exact failure a pinned broadcast would cause at
100 TB, reached WITHOUT a pin because the estimate is garbage on this
shape.

THE FIX this tool now verifies: decontaminate() is probe-inverted
(eval_bounded=True): the bounded eval (doc, shingle) pairs broadcast,
the corpus streams past them with NO corpus-wide shuffle, so the
expected ladder is Broadcast:Inner at EVERY mult with byte-identical
results and near-flat wall (the train side is scan+probe only). The
corpus-scaled-eval form (eval_bounded=False, pipeline_leakage) instead
merge-hints the semi join so neither unbounded side can be broadcast.

Results recorded in SCALE.md "Measured scaling".
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ballista_mvp_spark.queries import ALL_QUERIES
from ballista_mvp_spark.session import build_session
from ballista_mvp_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"
SYNTH_PER_MULT = 16_000
TOKENS_PER_DOC = 40


def build_instance(spark, out_dir: str, mult: int) -> None:
    docs = load_table(spark, SF_DIR, "documents")
    if mult == 0:
        docs.write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents.parquet")
        )
        return
    # globally-unique tokens => every 8-gram shingle is new and matches
    # no eval shingle; other columns filled with schema-typed defaults
    synth_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)),
            lambda j: F.concat(F.lit("zq"), F.col("id"), F.lit("x"), j),
        ),
    )
    base_cols = {f.name: f.dataType.simpleString() for f in docs.schema.fields}
    synth = spark.range(mult * SYNTH_PER_MULT).select(
        *[
            F.lit(None).cast(t).alias(c)
            for c, t in base_cols.items()
            if c not in ("doc_id", "source", "text")
        ],
        (F.col("id") + F.lit(1_000_000_000)).cast(base_cols["doc_id"]).alias("doc_id"),
        F.lit("synth").alias("source"),
        synth_text.alias("text"),
    )
    docs.unionByName(synth.select(docs.columns)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def semi_join_kind(df) -> str:
    """Every physical join in the executed plan, as impl:type — the
    probe join (keyed on the shingle hash) is the one under test; the
    trailing LeftOuter is the per-doc sizes join."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    kinds = []
    for line in plan.splitlines():
        for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"):
            if k in line:
                for jt in ("LeftSemi", "LeftOuter", "Inner"):
                    if jt in line:
                        kinds.append(f"{k[:-8]}:{jt}")
                        break
    # executedPlan prints AQE subtrees twice; dedupe preserving order
    seen: set[str] = set()
    uniq = [x for x in kinds if not (x in seen or seen.add(x))]
    return "+".join(uniq) or "?"


def result_digest(rows) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(tuple(r)).encode())
    return h.hexdigest()[:16]


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [0, 1, 4, 16, 64]
    spark = build_session("decon-scale")
    spark.sparkContext.setLogLevel("ERROR")
    q = ALL_QUERIES["text_decontaminate"]
    baseline = None
    print(f"{'mult':>5} {'synth_docs':>10} {'train_shingles':>14} "
          f"{'semi_join':>18} {'wall_s':>7} result")
    for mult in mults:
        tmp = tempfile.mkdtemp(prefix=f"decon_scale_{mult}_")
        try:
            build_instance(spark, tmp, mult)
            t0 = time.time()
            df = q(spark, tmp)
            rows = df.collect()
            wall = time.time() - t0
            kind = semi_join_kind(df)
            digest = result_digest(rows)
            docs = load_table(spark, tmp, "documents")
            from ballista_mvp_spark.operators.pipeline import (
                hashed_shingles,
                token_hashes,
            )

            n_sh = (
                docs.filter(F.col("source") != "src0")
                .select(token_hashes(F.col("text")).alias("_th"))
                .select(F.explode(hashed_shingles(F.col("_th"), 8)).alias("s"))
                .distinct()
                .count()
            )
            if baseline is None:
                baseline = digest
            invariant = "OK" if digest == baseline else "DIVERGED"
            print(
                f"{mult:>5} {mult * SYNTH_PER_MULT:>10} {n_sh:>14} "
                f"{kind:>18} {wall:>7.1f} {digest} rows={len(rows)} {invariant}"
            )
            if digest != baseline:
                return 1
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
