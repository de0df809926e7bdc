"""Digest-pinned scale ladder for the MinHash band-bucket shuffle
(VERDICT r9 #5 — the last big shuffle family whose post-policy behavior
was recorded only at bench scale).

Methodology (tools/decon_scale.py extended): each multiplier builds a
temp documents instance = the real sf0.01 corpus + mult x 16k synthetic
documents whose 40 tokens are globally unique ('mq<docid>x<j>'), so
every word-3-gram shingle of every synthetic doc is DISJOINT from every
other document's shingles. Pair output is invariant BY CONSTRUCTION:
a synthetic doc shares no shingle with anything, so it can only enter a
candidate bucket through an xxhash64 band-coincidence (~2^-64) and even
then the exact-Jaccard verify scores it 0 < threshold. The ladder runs
the registry dedup_minhash query (minhash_lsh_pairs, 16 hashes, 4
bands) unmodified and asserts a byte-identical pair digest at every
rung while recording:

- wall seconds (the (band, bh) one-shuffle agg + verify joins dominate),
- the physical kinds of the verify joins (pairs ⋈ shingle-map twice):
  under the shipped broadcast policy these are AQE RUNTIME decisions —
  the expected ladder is broadcast at small mult (pair side tiny)
  flipping to shuffle join only if the pair side ever materializes
  large, with NO static broadcast of the corpus-derived shingle map
  (the decon-class death this methodology originally caught).

Results recorded in SCALE.md "Measured scaling".

Usage: python tools/minhash_scale.py [mults...]   (default: 0 1 4 16 64)
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


def build_instance(spark, out_dir: str, mult: int) -> int:
    """Write the grown documents instance; returns total doc count."""
    docs = load_table(spark, SF_DIR, "documents")
    out = os.path.join(out_dir, "documents.parquet")
    if mult == 0:
        docs.write.mode("overwrite").parquet(out)
        return docs.count()
    synth_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)),
            lambda j: F.concat(F.lit("mq"), F.col("id"), F.lit("x"), j),
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
    grown = docs.unionByName(synth.select(docs.columns))
    grown.write.mode("overwrite").parquet(out)
    return grown.count()


def join_kinds(df) -> str:
    """Physical kinds of every join in the FINAL adaptive plan only —
    the executedPlan printout appends the pre-AQE '== Initial Plan =='
    subtree, which must not be conflated with what actually ran."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    kinds = []
    for line in plan.splitlines():
        for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                  "BroadcastNestedLoopJoin", "CartesianProduct"):
            if k in line:
                kinds.append(k.replace("Join", "").replace("Exec", ""))
    seen: set[str] = set()
    return "+".join(x for x in kinds if not (x in seen or seen.add(x))) or "none"


def result_digest(rows) -> str:
    h = hashlib.sha256()
    for r in sorted(tuple(r) for r in rows):
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [0, 1, 4, 16, 64]
    spark = build_session("minhash-scale")
    spark.sparkContext.setLogLevel("ERROR")
    q = ALL_QUERIES["dedup_minhash"]
    baseline = None
    print(f"{'mult':>5} {'docs':>9} {'banded_rows':>12} {'joins':>28} "
          f"{'wall_s':>7} result")
    for mult in mults:
        tmp = tempfile.mkdtemp(prefix=f"minhash_scale_{mult}_")
        try:
            n_docs = build_instance(spark, tmp, mult)
            t0 = time.time()
            df = q(spark, tmp)
            rows = df.collect()
            wall = time.time() - t0
            kinds = join_kinds(df)
            digest = result_digest(rows)
            if baseline is None:
                baseline = digest
            invariant = "OK" if digest == baseline else "DIVERGED"
            print(
                f"{mult:>5} {n_docs:>9} {n_docs * 4:>12} {kinds:>28} "
                f"{wall:>7.1f} {digest} rows={len(rows)} {invariant}"
            )
            if digest != baseline:
                return 1
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
