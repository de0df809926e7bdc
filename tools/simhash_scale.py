"""Digest-pinned scale ladder for the SimHash hamming-band family
(VERDICT r10 #4 — the last band-bucket family without one; minhash
landed r10, decon r9).

Methodology (tools/minhash_scale.py adapted): each multiplier builds a
temp documents instance = the real sf0.01 corpus + a CONSTANT planted
set (1000 exact-duplicate pairs, ids 1e9..1e9+1999, deterministic
disjoint-token texts) + mult x 16k growth documents whose 40 tokens are
globally unique ('mq<docid>x<j>', ids >= 2e9). The ladder runs the
registry dedup_simhash query (simhash_pairs -> hamming_band_pairs,
4x16-bit bands, hamming <= 12) unmodified.

Why the digest is RESTRICTED to base-set pairs (ids < 2e9), unlike the
minhash ladder's full-output digest: minhash buckets on a 64-bit
xxhash64 of the band slice, so a cross-document bucket coincidence is a
~2^-64 event and disjoint shingles imply an invariant FULL output.
SimHash buckets on a RAW 16-bit signature chunk and verifies with a
hamming threshold, so at millions of documents band coincidences are
routine (2.05M docs x 4 bands / 65536 buckets ~ 125 rows per bucket)
and a conditioned-on-one-band random pair passes hamming<=12 with
p ~ 5e-4 (sum C(47,k<=12)/2^47) — growth-involved collision pairs are
CORRECT outputs of the signature predicate that provably appear as the
corpus grows (the signature-collision regime hamming_band_pairs'
docstring documents; signature_entropy/max_bucket is the production
mitigation). The invariant that IS provable: pair emission is a
PAIRWISE predicate of the two signatures alone (share >=1 chunk AND
hamming <= 12; no bucket cap in this query), so adding rows can never
change whether a base-set pair is emitted — the base-restricted digest
must be byte-identical at every rung, and every planted pair must be
present (hamming 0, all 4 bands agree: a recall floor under growth).

Recorded per rung: base-pair digest (must be invariant), planted-pair
recall (must be 1000/1000), growth-involved pair count (expected to
grow — reported, not pinned), physical join kinds of the FINAL adaptive
plan (the band-bucket self-join must stay AQE-decided from materialized
sizes; no estimate-trusted static broadcast of a corpus-scaled side),
banded row count, and wall seconds.

Results recorded in SCALE.md "Measured scaling".

Usage: python tools/simhash_scale.py [mults...]   (default: 0 1 4 16 64 128)
Exit 1 on digest divergence or planted-recall loss.
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
PLANTED_PAIRS = 1_000
PLANT_BASE = 1_000_000_000  # planted ids: PLANT_BASE .. PLANT_BASE+1999
GROWTH_BASE = 2_000_000_000  # growth ids: >= GROWTH_BASE


def _synth_text(prefix: str, key_col):
    """40 tokens '<prefix><key>x<j>' — word-3-gram shingles disjoint from
    every other document's (same construction as minhash_scale)."""
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)),
            lambda j: F.concat(F.lit(prefix), key_col, F.lit("x"), j),
        ),
    )


def build_instance(spark, out_dir: str, mult: int) -> int:
    """Write the grown documents instance (real + planted + mult x
    growth); returns total doc count."""
    docs = load_table(spark, SF_DIR, "documents")
    out = os.path.join(out_dir, "documents.parquet")
    base_cols = {f.name: f.dataType.simpleString() for f in docs.schema.fields}
    other = [
        F.lit(None).cast(t).alias(c)
        for c, t in base_cols.items()
        if c not in ("doc_id", "source", "text")
    ]
    # planted: pair k -> ids PLANT_BASE+2k / +2k+1, IDENTICAL text
    # (identical signature, hamming 0 -> guaranteed pair at every rung)
    planted = spark.range(2 * PLANTED_PAIRS).select(
        *other,
        (F.col("id") + F.lit(PLANT_BASE)).cast(base_cols["doc_id"]).alias("doc_id"),
        F.lit("planted").alias("source"),
        _synth_text("pl", (F.col("id") / 2).cast("long")).alias("text"),
    )
    grown = docs.unionByName(planted.select(docs.columns))
    if mult > 0:
        growth = spark.range(mult * SYNTH_PER_MULT).select(
            *other,
            (F.col("id") + F.lit(GROWTH_BASE)).cast(base_cols["doc_id"]).alias("doc_id"),
            F.lit("synth").alias("source"),
            _synth_text("mq", F.col("id")).alias("text"),
        )
        grown = grown.unionByName(growth.select(docs.columns))
    grown.write.mode("overwrite").parquet(out)
    return grown.count()


def join_kinds(df) -> str:
    """Physical kinds of every join in the FINAL adaptive plan only."""
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
    mults = [int(a) for a in sys.argv[1:]] or [0, 1, 4, 16, 64, 128]
    spark = build_session("simhash-scale")
    spark.sparkContext.setLogLevel("ERROR")
    q = ALL_QUERIES["dedup_simhash"]
    baseline = None
    print(f"{'mult':>5} {'docs':>9} {'banded_rows':>12} {'joins':>16} "
          f"{'wall_s':>7} {'growth_pairs':>12} {'planted':>9} result")
    for mult in mults:
        tmp = tempfile.mkdtemp(prefix=f"simhash_scale_{mult}_")
        try:
            n_docs = build_instance(spark, tmp, mult)
            t0 = time.time()
            df = q(spark, tmp)
            rows = df.collect()
            wall = time.time() - t0
            kinds = join_kinds(df)
            base_rows = [
                r for r in rows if r["a"] < GROWTH_BASE and r["b"] < GROWTH_BASE
            ]
            growth_pairs = len(rows) - len(base_rows)
            planted_found = sum(
                1
                for r in base_rows
                if r["a"] >= PLANT_BASE
                and r["b"] == r["a"] + 1
                and (r["a"] - PLANT_BASE) % 2 == 0
                and r["hamming"] == 0
            )
            digest = result_digest(base_rows)
            if baseline is None:
                baseline = digest
            ok = digest == baseline and planted_found == PLANTED_PAIRS
            print(
                f"{mult:>5} {n_docs:>9} {n_docs * 4:>12} {kinds:>16} "
                f"{wall:>7.1f} {growth_pairs:>12} "
                f"{planted_found:>4}/{PLANTED_PAIRS} {digest} "
                f"base_pairs={len(base_rows)} {'OK' if ok else 'FAILED'}"
            )
            if not ok:
                return 1
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
