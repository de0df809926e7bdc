"""Scale-stress harness: how do the corpus-hygiene operators scale?

Usage: python tools/scale_stress.py [multipliers ...]   (default: 1 5 20)

Replicates the sf0.1 documents table N× with shifted doc_ids. Every token
of copy c > 0 is suffixed with the copy id, giving each copy a DISJOINT
vocabulary: no shingle, window, minhash band, or prefix block ever matches
across copies, the planted near-dup pairs stay within each copy, result
sizes grow linearly, and the measured scaling reflects the operator — not
an artificial pair explosion. (A first version salted only the END of the
text; replicas stayed ~0.99-Jaccard near-dups of each other and every
pair op exploded quadratically — a useful adversarial datapoint, recorded
in SCALE.md, but not a scaling measurement.) Near-linear wall-time growth
demonstrates the O(n) shuffle design; super-linear growth flags a pair
blow-up.

Results recorded in SCALE.md §"Measured scaling".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ballista_mvp_spark.operators import dedup as D
from ballista_mvp_spark.session import build_session
from ballista_mvp_spark.tables import load_table


def replicate(docs, n: int):
    """n salted copies with disjoint id ranges; copy 0 is the original."""
    if n == 1:
        return docs
    copies = docs.crossJoin(F.broadcast(
        docs.sparkSession.range(n).select(F.col("id").alias("_copy"))
    ))
    shift = F.lit(1_000_000)
    c = F.col("_copy").cast("string")
    salted = F.array_join(
        F.transform(F.split(F.col("text"), " "), lambda t: F.concat(t, F.lit("¤"), c)),
        " ",
    )
    return copies.select(
        (F.col("doc_id") + F.col("_copy") * shift).alias("doc_id"),
        F.when(F.col("_copy") == 0, F.col("text")).otherwise(salted).alias("text"),
    )


OPS = {
    "dedup_exact": lambda d: D.exact_dedup(
        d, F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))), "doc_id"
    ),
    "dedup_minhash": lambda d: D.minhash_lsh_pairs(
        d, "doc_id", "text", num_hashes=16, bands=4, jaccard_threshold=0.2
    ),
    "dedup_substring": lambda d: D.substring_dup_spans(
        d, "doc_id", "text", window=8, min_span_tokens=20
    ),
    "dedup_ngram_jaccard": lambda d: D.ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_k=3, threshold=0.2
    ),
    "dedup_fuzzy": lambda d: D.fuzzy_pairs(d, "doc_id", "text"),
    # CCNet-style line dedup over 6-token pseudo-lines (the salting keeps
    # copies' lines disjoint, so duplicate-line mass grows linearly)
    "text_line_dedup": lambda d: _line_dedup_op(d),
    # DSIR importance weights; target = 5% of docs by id. The salted
    # copies' disjoint vocabularies grow the distinct-token table
    # linearly, stressing the vocab ranking alongside the token shuffles.
    "text_dsir": lambda d: _dsir_op(d),
    # BPE merge loop: the ¤-salt is stripped by the [a-z] word filter, so
    # replication multiplies word COUNTS while the vocabulary stays fixed
    # — exactly the real-world regime (vocab saturates as the corpus
    # grows). Expected: the one corpus-wide word-count pass scales
    # linearly; the 4-round merge loop is corpus-size-independent.
    "text_bpe": lambda d: _bpe_op(d),
    # BPE ENCODING (the serving-side hot path): same fixed-vocab regime
    # as text_bpe — replication multiplies word counts, the vocab (and
    # so the merge-chain work) stays fixed. Expected: linear in the one
    # word-count pass, flat everywhere else.
    "text_bpe_encode": lambda d: _bpe_encode_op(d),
}


def _dsir_op(d):
    from ballista_mvp_spark.operators import text as TX

    return TX.dsir_logweights(
        d, "doc_id", "text", F.col("doc_id") % 20 == 0, vocab_size=64
    )


def _bpe_op(d):
    from ballista_mvp_spark.operators import text as TX

    return TX.bpe_merges(d, "doc_id", "text", num_merges=4)


def _bpe_encode_op(d):
    from ballista_mvp_spark.operators import text as TX

    return TX.bpe_encode(
        d, "doc_id", "text",
        merges=["t h", "i n", "a n", "e r", "th e", "o n", "r e", "an d"],
    )


def _line_dedup_op(d):
    from ballista_mvp_spark.operators import text as TX

    lined = d.select(
        "doc_id", F.regexp_replace("text", "((\\S+ ){6})", "$1\x01").alias("text")
    )
    return TX.line_dedup(lined, "doc_id", "text", delim="\x01", min_count=2)


def replicate_vecs(emb, n: int):
    """n copies of the embedding corpus with disjoint id ranges; copy
    c > 0 vectors are deterministically rotated (element roll by c) so
    copies are not mutual near-duplicates and ANN candidate sets stay
    bounded."""
    if n == 1:
        return emb
    copies = emb.crossJoin(F.broadcast(
        emb.sparkSession.range(n).select(F.col("id").alias("_copy"))
    ))
    dim = 64
    rolled = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.element_at(
            "embedding", (F.pmod(i + F.col("_copy"), F.lit(dim)) + 1).cast("int")
        ),
    )
    return copies.select(
        (F.col("vec_id") + F.col("_copy") * 1_000_000).alias("vec_id"),
        F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(rolled).alias("embedding"),
    )


def _ann_ops():
    from ballista_mvp_spark.operators import similarity as S

    def queries_of(d):
        return d.filter(F.col("vec_id") < 8)

    return {
        "sim_topk_bruteforce": lambda d: S.brute_force_topk(
            d, queries_of(d), "vec_id", "embedding", k=5
        ),
        "sim_ann_lsh": lambda d: S.lsh_ann_topk(
            d, queries_of(d), 64, "vec_id", "embedding", k=5
        ),
        "sim_outliers": lambda d: S.embedding_outliers(d, "vec_id", "embedding"),
    }


def _index_stress(spark, sf_dir, mults):
    """Persistent-IVF probe cost vs corpus size: with the cell-hive
    layout, probe wall time must stay ~flat as the corpus grows (the
    scan prunes to n_probe cells). Recorded in SCALE.md."""
    import shutil
    import tempfile

    from ballista_mvp_spark.operators import ann_index as AI

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    for m in mults:
        reps = base
        for c in range(1, m):
            reps = reps.unionByName(
                base.select((F.col("vec_id") + c * 1_000_000).alias("vec_id"),
                            "embedding", "label")
            )
        reps = reps.localCheckpoint(eager=True)
        n = reps.count()
        d = tempfile.mkdtemp()
        try:
            t0 = time.perf_counter()
            AI.build_ivf_index(reps, d, n_cells=64)
            tb = time.perf_counter() - t0
            q = base.filter(F.col("vec_id") < 8)
            t0 = time.perf_counter()
            rows = AI.probe_ivf_index(spark, d, q, k=5, n_probe=4).count()
            tp = time.perf_counter() - t0
            print(f"x{m:<3} vecs={n:<8} ivf_index build={tb:5.1f}s probe={tp:5.1f}s rows={rows}", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)


def _components_stress(spark, mults) -> None:
    """Connected-components scaling: synthetic binary-lifting forests
    (the graph_components query shape — 1000 groups, tree edge
    rank DIV 2 -> rank) at N = 100k·m nodes. Wall time should grow
    ~linearly in nodes while the round count grows as log2(group size):
    the per-round cost is one (id)-keyed join + min-agg over 16-byte
    rows and the fixpoint test is a 1-row count."""
    from pyspark.sql import functions as FF

    for m in mults:
        n = 100_000 * m
        groups = 1000
        nodes = spark.range(n).select(FF.col("id"))
        ranked = nodes.select(
            "id", (FF.col("id") % groups).alias("g"), (FF.col("id") / groups).cast("long").alias("r")
        )
        parents = ranked.select(FF.col("id").alias("a"), "g", FF.col("r").alias("pr"))
        edges = (
            ranked.filter(FF.col("r") >= 1)
            .select(FF.col("id").alias("b"), "g", ((FF.col("r") - 1) / 2).cast("long").alias("pr"))
            .join(parents, ["g", "pr"])
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        comp = D.connected_components(nodes, edges)
        n_comp = comp.select("comp").distinct().count()
        dt = time.perf_counter() - t0
        rounds = getattr(D.connected_components, "last_rounds", -1)
        assert n_comp == groups, (n_comp, groups)
        print(
            f"x{m:<3} nodes={n:<9} graph_components comps={n_comp:<6} "
            f"rounds={rounds} ({dt / max(rounds, 1):4.2f}s/round) {dt:6.2f}s",
            flush=True,
        )
        t0 = time.perf_counter()
        comp2 = D.connected_components_twophase(nodes, edges)
        n_comp2 = comp2.select("comp").distinct().count()
        dt2 = time.perf_counter() - t0
        rounds2 = getattr(D.connected_components_twophase, "last_rounds", -1)
        assert n_comp2 == groups, (n_comp2, groups)
        print(
            f"x{m:<3} nodes={n:<9} components_twophase comps={n_comp2:<6} "
            f"rounds={rounds2} ({dt2 / max(rounds2, 1):4.2f}s/round) {dt2:6.2f}s",
            flush=True,
        )


def _graph_stress(spark, mults) -> None:
    """Scaling of the round-5 graph operators (k-core peel, label
    propagation, Jaccard link prediction) on a synthetic
    community-ring-lattice graph: 1000-node blocks, each a ring lattice
    of degree 4 (every node linked to the 2 nearest ring neighbors on
    each side — triangles exist, the 3-core is the whole graph), one
    cross edge per adjacent block pair. Degree is CONSTANT, so wedge
    fan-out (jaccard) and per-round join volume (kcore/labelprop) must
    grow linearly in nodes; super-linear growth flags a plan
    regression. Fixed supersteps (4 peel rounds / 3 propagation
    iterations) exactly like the certified queries."""
    from pyspark.sql import functions as FF

    from ballista_mvp_spark.operators import graph as G

    s = 1000
    for m in mults:
        n = 100_000 * m
        groups = n // s
        ids = spark.range(n).select(FF.col("id"))
        b = FF.col("id") - (FF.col("id") % s)  # block base
        o = FF.col("id") % s
        ring1 = ids.select(FF.col("id").alias("src"), (b + (o + 1) % s).alias("dst"))
        ring2 = ids.select(FF.col("id").alias("src"), (b + (o + 2) % s).alias("dst"))
        cross = ids.filter(o == 0).select(
            FF.col("id").alias("src"),
            (((b / s + 1) % groups) * s).cast("long").alias("dst"),
        )
        edges = ring1.union(ring2).union(cross).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        survivors = G.kcore_peel(edges, k=3, rounds=4).count()
        dt = time.perf_counter() - t0
        assert survivors == n, (survivors, n)  # degree>=4: nothing peels
        print(
            f"x{m:<3} nodes={n:<9} graph_kcore    survivors={survivors:<9} "
            f"{dt:6.2f}s ({dt / 4:5.2f}s/round, 4 rounds structure-fixed)",
            flush=True,
        )

        t0 = time.perf_counter()
        labeled = G.label_propagation(edges, iterations=3).count()
        dt = time.perf_counter() - t0
        assert labeled == n, (labeled, n)
        print(
            f"x{m:<3} nodes={n:<9} graph_labelprop labeled={labeled:<9} "
            f"{dt:6.2f}s ({dt / 3:5.2f}s/superstep, 3 fixed)",
            flush=True,
        )

        # PPR: seeds = one node per block (the block bases), 5 fixed
        # power iterations; rank mass must stay 1 within the per-node
        # 6dp output rounding (|err| <= n * 5e-7 worst case)
        seeds = ids.filter(o == 0).select(FF.col("id").alias("node"))
        t0 = time.perf_counter()
        ppr = G.personalized_pagerank(edges, seeds, iterations=5)
        n_ranked, mass = ppr.agg(FF.count("*"), FF.sum("rank")).first()
        dt = time.perf_counter() - t0
        assert n_ranked == n, (n_ranked, n)
        assert abs(mass - 1.0) < n * 5e-7 + 1e-3, mass
        print(
            f"x{m:<3} nodes={n:<9} graph_ppr      mass={mass:<9.4f} "
            f"{dt:6.2f}s ({dt / 5:5.2f}s/iteration, 5 fixed)",
            flush=True,
        )

        t0 = time.perf_counter()
        links = G.jaccard_links(edges).count()
        dt = time.perf_counter() - t0
        print(f"x{m:<3} nodes={n:<9} graph_jaccard  pairs={links:<10} {dt:6.2f}s", flush=True)


def _skew_stress(spark, mults) -> None:
    """Measured skew crossover for operators/skew.py (VERDICT r5 #8):
    a zipf-hot dataset — ONE key owns 50% of all rows, the rest spread
    uniformly over 10k keys — aggregated and joined four ways:

    - agg: plain groupBy-sum vs salted_agg. Spark's map-side partial
      hash aggregation already parallelizes a hot key for ALGEBRAIC
      aggregates, so the expectation is parity (recorded either way —
      salted_agg's two-stage shape matters when partials are
      ineffective: count distinct / collect-style or agg fallback).
    - join vs a 10k-row dim with broadcast DISABLED (simulating a dim
      too large for the driver): plain sort-merge with AQE off (the
      straggler baseline), plain with AQE skew-split on, salted_join
      with AQE off (plan-time spread, no runtime stats needed).

    Every variant's row count and checksum must agree; wall times and
    the crossover go to SCALE.md."""
    from pyspark.sql import functions as FF

    from ballista_mvp_spark.operators import skew as S

    conf = spark.conf
    aqe0 = conf.get("spark.sql.adaptive.enabled")
    bj0 = conf.get("spark.sql.autoBroadcastJoinThreshold")

    def run(label, thunk, aqe):
        conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # the shipped policy's AQE runtime threshold (session.py) would
        # broadcast the skewed join's small side and bypass the skew
        # machinery this stress measures — pin it off for the probe
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        t0 = time.perf_counter()
        out = thunk()
        return label, out, time.perf_counter() - t0

    try:
        for m in mults:
            n = 1_000_000 * m
            # deterministic zipf-hot fact: even ids -> key 0 (50% hot),
            # odd ids spread over keys 1..9999
            fact = spark.range(n).select(
                FF.when(FF.col("id") % 2 == 0, FF.lit(0))
                .otherwise(FF.col("id") % 9999 + 1)
                .alias("k"),
                (FF.col("id") % 97).cast("double").alias("v"),
                FF.col("id").alias("uid"),
            ).localCheckpoint(eager=True)
            dim = spark.range(10_000).select(
                FF.col("id").alias("k"), (FF.col("id") * 3).alias("w")
            ).localCheckpoint(eager=True)

            # -- aggregation --
            ref = None
            for label, aqe, thunk in (
                ("agg_plain      ", True,
                 lambda: fact.groupBy("k").agg(FF.sum("v").alias("s"))
                 .agg(FF.count("*"), FF.round(FF.sum("s"), 2)).first()),
                ("agg_salted     ", True,
                 lambda: S.salted_agg(fact, ["k"], {"s": ("sum", "v")},
                                      salt_from=["uid"])
                 .agg(FF.count("*"), FF.round(FF.sum("s"), 2)).first()),
            ):
                label, out, dt = run(label, thunk, aqe)
                ref = ref or out
                assert tuple(out) == tuple(ref), (label, out, ref)
                print(f"x{m:<3} rows={n:<9} skew {label} groups={out[0]:<6} "
                      f"{dt:6.2f}s", flush=True)

            # -- join (broadcast disabled throughout) --
            ref = None
            for label, aqe, thunk in (
                ("join_plain_noaqe", False,
                 lambda: fact.join(dim, "k")
                 .agg(FF.count("*"), FF.sum(FF.col("v") + FF.col("w"))).first()),
                ("join_plain_aqe  ", True,
                 lambda: fact.join(dim, "k")
                 .agg(FF.count("*"), FF.sum(FF.col("v") + FF.col("w"))).first()),
                ("join_salted     ", False,
                 lambda: S.salted_join(fact, dim.withColumnRenamed("k", "k2"),
                                       "k", "k2", salt_from=["uid"])
                 .agg(FF.count("*"), FF.sum(FF.col("v") + FF.col("w"))).first()),
            ):
                label, out, dt = run(label, thunk, aqe)
                ref = ref or out
                assert tuple(out) == tuple(ref), (label, out, ref)
                print(f"x{m:<3} rows={n:<9} skew {label} n={out[0]:<9} "
                      f"{dt:6.2f}s", flush=True)
    finally:
        conf.set("spark.sql.adaptive.enabled", aqe0)
        conf.set("spark.sql.autoBroadcastJoinThreshold", bj0)
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")


def _stats_stress(spark, mults) -> None:
    """Measured scale datapoints for the round-5 stats family (VERDICT
    r6 #7): the KS / Mann-Whitney / Spearman shapes all collapse the
    corpus to the distinct-value SUPPORT via a map-side-combined groupBy
    before any window runs, so wall time should scale with the SCAN, and
    the single-partition window cost stays bounded by the support. Each
    tier synthesizes m × 1M rows (value support pinned at ~3000 for the
    two-sample tests, ~5000/10000 for the spearman x/y axes), runs the
    exact query shapes (queries/extensions.py), and records corpus rows,
    support rows, the support/corpus ratio, and wall seconds."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    for m in mults:
        n = m * 1_000_000
        base = spark.range(n).select(
            "id",
            (F.pmod(F.xxhash64("id"), F.lit(3000)) + 50).alias("n_chars"),
            F.when(F.pmod(F.col("id"), F.lit(2)) == 0, "src0")
            .otherwise("src1")
            .alias("source"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5000)).alias("x"),
            F.round(
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10000)) / 10000.0, 9
            ).alias("y"),
        )

        def timed(label, thunk):
            t0 = time.perf_counter()
            out = thunk()
            dt = time.perf_counter() - t0
            print(f"x{m:<4} rows={n:<10} {label:<18} {out}  {dt:6.2f}s",
                  flush=True)

        def ks():
            cells = base.groupBy("n_chars").agg(
                F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("ca"),
                F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("cb"),
            )
            wcum = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, 0)
            ecdf = cells.select(
                (F.sum("ca").over(wcum) / F.sum("ca").over(W.partitionBy())).alias("fa"),
                (F.sum("cb").over(wcum) / F.sum("cb").over(W.partitionBy())).alias("fb"),
            )
            d = ecdf.agg(F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("d")).first().d
            s = cells.count()
            return f"support={s} ({s/n:.2e} of corpus) ks_d={d}"

        def mw():
            cells = base.groupBy("n_chars").agg(
                F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("ca"),
                F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("cb"),
            )
            wcum = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, 0)
            t = F.col("ca") + F.col("cb")
            ranked = cells.select("ca", t.alias("t"), F.sum(t).over(wcum).alias("cum"))
            agg = ranked.agg(
                F.sum(F.col("ca") * (2 * F.col("cum") - F.col("t") + 1)).alias("ra2"),
                F.sum("ca").alias("na"),
                F.sum(F.col("t") - F.col("ca")).alias("nb"),
            ).first()
            u_a = (agg.ra2 - agg.na * (agg.na + 1)) / 2.0
            s = cells.count()
            return f"support={s} ({s/n:.2e} of corpus) u_a={u_a:.3e}"

        def spearman():
            per = base.select("x", "y")

            def rank_map(col):
                cells = per.groupBy(col).agg(F.count(F.lit(1)).alias("_t"))
                wcum = W.orderBy(col).rowsBetween(W.unboundedPreceding, 0)
                return cells.select(
                    col,
                    (F.sum("_t").over(wcum) - (F.col("_t") - 1) / 2.0).alias(f"r{col}"),
                )

            ranked = per.join(rank_map("x"), "x").join(rank_map("y"), "y")
            rho = ranked.agg(F.round(F.corr("rx", "ry"), 6).alias("r")).first().r
            sx = per.select("x").distinct().count()
            sy = per.select("y").distinct().count()
            return f"support_x={sx} support_y={sy} ({(sx+sy)/n:.2e}) rho={rho}"

        timed("stats_ks_test", ks)
        timed("stats_mannwhitney", mw)
        timed("stats_spearman", spearman)


def _mutate_stress(spark, sf_dir, mults) -> None:
    """Fixed-size MERGE/DELETE cost vs table size: with key-clustered
    files + manifest min/max stats, a constant-size mutation must
    rewrite a ~constant number of files, so wall time stays ~flat as
    the table grows — the O(touched files) contract of
    sources/versioned.py. The unpruned delete row is the contrast: an
    arbitrary-predicate phase-1 scan grows with the table (column-pruned
    to the predicate columns, but still a full pass)."""
    import shutil
    import tempfile

    from ballista_mvp_spark.sources import versioned as V

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for m in mults:
        corpus = replicate(base, m).localCheckpoint(eager=True)
        n = corpus.count()
        d = tempfile.mkdtemp()
        t = os.path.join(d, "tbl")
        try:
            V.write_versioned(
                corpus.repartitionByRange(4 * m, "doc_id"), t,
                stats_cols=["doc_id"],
            )
            src = base.filter(F.col("doc_id") < 200).select(
                "doc_id", F.concat(F.lit("v2 "), "text").alias("text")
            )
            t0 = time.perf_counter()
            v = V.merge_versioned(spark, t, src, key="doc_id", stats_cols=["doc_id"])
            tm = time.perf_counter() - t0
            mm = V._read_manifest(t, v)
            t0 = time.perf_counter()
            v = V.delete_versioned(
                spark, t, "doc_id >= 300 AND doc_id < 400",
                stats_cols=["doc_id"], prune=("doc_id", 300, 399),
            )
            td = time.perf_counter() - t0
            md = V._read_manifest(t, v)
            t0 = time.perf_counter()
            v = V.delete_versioned(
                spark, t, "doc_id >= 500 AND doc_id < 600", stats_cols=["doc_id"]
            )
            tu = time.perf_counter() - t0
            mu = V._read_manifest(t, v)
            print(
                f"x{m:<3} docs={n:<8} files={mm['n_files']:<4} "
                f"merge200 rw={mm['n_rewritten']} {tm:5.2f}s | "
                f"del+prune rw={md['n_rewritten']} {td:5.2f}s | "
                f"del-noprune rw={mu['n_rewritten']} {tu:5.2f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


def _stream_stress(spark, sf_dir, mults) -> None:
    """Per-micro-batch sink cost vs ACCUMULATED table size: feed the
    events table through streaming/run_incremental_sink as K equal
    time-ordered chunks (one chunk per invocation, one shared
    checkpoint) and time every batch. The sink's contract is
    O(batch + touched hour partitions) per batch — never O(table) — so
    per-batch wall time must stay ~flat from the first chunk (empty
    table) to the last (full rollup materialized: the dynamic partition
    overwrite rewrites only the hours the chunk touched). A growing
    trend would mean the sink re-reads or rewrites the accumulated
    table. Per-batch constant overhead (stream start + checkpoint
    commit, ~seconds) is included and reported as-is; the TREND is the
    signal."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import Window as W

    from ballista_mvp_spark.streaming import run_incremental_sink

    n_batches = max(mults) if mults else 8
    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp()
    try:
        staged = os.path.join(d, "staged")
        (
            ev.withColumn(
                "_c", F.ntile(n_batches).over(W.orderBy("ts", "event_id"))
            )
            .write.partitionBy("_c")
            .parquet(staged)
        )
        src_dir = os.path.join(d, "src")
        os.makedirs(src_dir)
        schema = ev.schema
        out = os.path.join(d, "rollup")
        ckpt = os.path.join(d, "ckpt")
        for i in range(1, n_batches + 1):
            files = glob.glob(f"{staged}/_c={i}/*.parquet")
            batch_rows = spark.read.parquet(f"{staged}/_c={i}").count()
            for j, f in enumerate(files):
                shutil.copy(f, os.path.join(src_dir, f"chunk{i}_{j}.parquet"))
            source = spark.readStream.schema(schema).parquet(src_dir)
            t0 = time.perf_counter()
            run_incremental_sink(spark, sf_dir, out, ckpt, source=source)
            dt = time.perf_counter() - t0
            tbl = spark.read.parquet(out)
            n_rows = tbl.count()
            n_parts = tbl.select("hour").distinct().count()
            print(
                f"batch {i:>2}/{n_batches} rows_in={batch_rows:<7} "
                f"{dt:6.2f}s | table: rows={n_rows:<6} hours={n_parts}",
                flush=True,
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _media_stress(spark, sf_dir, mults) -> None:
    """Multimodal path cost vs corpus size: the three payload-touching
    stages — featurize (mapInPandas), featurize_arrow (mapInArrow), and
    phash_dup_pairs (pandas_udf signature + Hamming band join) — over
    the documents-derived media table replicated N×. The claims under
    measurement: both featurize paths are partition-local scans (linear
    wall growth, no shuffle), and the phash pair stage shuffles 16-byte
    (id, signature) rows — payload bytes never move, so its cost tracks
    the signature/candidate tables, not payload volume. The pair COUNT
    is also reported: it measures the fake byte-stat signature's
    selectivity, not the join (see SCALE.md Multimodal for the honest
    reading)."""
    from ballista_mvp_spark.operators import multimodal as M

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for m in mults:
        docs = replicate(base, m).withColumn("source", F.lit("s"))
        media = M.media_from_documents(docs).localCheckpoint(eager=True)
        n = media.count()
        mb = (
            media.agg(F.sum(F.col("meta.n_bytes")).alias("b")).collect()[0]["b"]
            / 1e6
        )
        t0 = time.perf_counter()
        M.featurize(media).count()
        tp = time.perf_counter() - t0
        t0 = time.perf_counter()
        M.featurize_arrow(media).count()
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        pairs = M.phash_dup_pairs(media, max_hamming=3).count()
        th = time.perf_counter() - t0
        # the signature_entropy pre-flight contract: its cost (one
        # map-side-combined count pass over the sigs, 3 driver scalars)
        # vs the quadratic pair stage it gates
        from ballista_mvp_spark.operators.dedup import signature_entropy

        sigs = M.perceptual_hash(media).persist()
        sigs.count()  # materialize outside the timed window
        t0 = time.perf_counter()
        ent = signature_entropy(sigs)
        te = time.perf_counter() - t0
        sigs.unpersist()
        print(
            f"x{m:<3} media={n:<7} payload={mb:7.1f}MB "
            f"featurize(pandas) {tp:6.2f}s | featurize(arrow) {ta:6.2f}s | "
            f"phash pairs={pairs:<6} {th:6.2f}s | "
            f"entropy pre-flight {te:5.2f}s "
            f"(distinct_ratio={ent['distinct_ratio']}, "
            f"max_bucket_share={ent['max_bucket_share']})",
            flush=True,
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    do_ann = "--ann" in args
    do_index = "--index" in args
    do_components = "--components" in args
    do_graph = "--graph" in args
    do_skew = "--skew" in args
    do_stats = "--stats" in args
    do_mutate = "--mutate" in args
    do_stream = "--stream" in args
    do_media = "--media" in args
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1]
        del args[i:i + 2]
    mults = [
        int(a)
        for a in args
        if a not in ("--ann", "--index", "--components", "--mutate",
                     "--graph", "--skew", "--stats", "--stream", "--media")
    ] or [1, 5, 20]
    spark = build_session("scale-stress")
    if do_media:
        _media_stress(spark, sf_dir, mults)
        return
    if do_stream:
        _stream_stress(spark, sf_dir, mults)
        return
    if do_mutate:
        _mutate_stress(spark, sf_dir, mults)
        return
    if do_components:
        _components_stress(spark, mults)
        return
    if do_graph:
        _graph_stress(spark, mults)
        return
    if do_skew:
        _skew_stress(spark, mults)
        return
    if do_stats:
        _stats_stress(spark, mults)
        return
    if do_index:
        _index_stress(spark, sf_dir, mults)
        return
    if do_ann:
        base = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        for m in mults:
            corpus = replicate_vecs(base, m).localCheckpoint(eager=True)
            n = corpus.count()
            for name, op in _ann_ops().items():
                t0 = time.perf_counter()
                rows = op(corpus).count()
                dt = time.perf_counter() - t0
                print(f"x{m:<3} vecs={n:<8} {name:<22} rows={rows:<8} {dt:6.2f}s", flush=True)
        return
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for m in mults:
        corpus = replicate(base, m).localCheckpoint(eager=True)  # isolate gen cost
        n = corpus.count()
        for name, op in OPS.items():
            if only and not name.startswith(only):
                continue
            t0 = time.perf_counter()
            rows = op(corpus).count()
            dt = time.perf_counter() - t0
            print(f"x{m:<3} docs={n:<8} {name:<22} rows={rows:<8} {dt:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
