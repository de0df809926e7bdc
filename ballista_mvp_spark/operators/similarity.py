"""Similarity search over embedding columns (array<float>).

BASELINE.json north-star extension: approximate-nearest-neighbor over an
embedding column. Two paths:

- brute-force top-k (the exactness baseline): broadcast the query set,
  score every (query, candidate) with a JVM-side cosine (zip_with +
  aggregate — no Python, no UDF), per-query top-k via window. At 100 TB
  the candidate scan is embarrassingly parallel; the only shuffle is the
  per-query top-k (k rows per partition per query after partial rank
  pruning).

- LSH-bucketed ANN (the scale path): random-hyperplane signatures using
  deterministic seeded coefficients broadcast as literals; candidates
  restricted to matching buckets (multi-probe via several tables), then
  exact re-rank. Recall is tunable via (n_planes, n_tables).
"""

from __future__ import annotations

import math
import random
import re

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def nested_double_lit(obj, elem_sql_type: str = "double") -> Column:
    """A nested array<...<double>> literal as ONE resolved Catalyst node
    (pass ``elem_sql_type="bigint"`` for exact-integer matrices — the
    same two construction taxes apply to any wide F.lit, e.g. the Bloom
    word array at 2048 longs).

    ``F.lit`` on a nested Python list recurses into ``array(*map(lit,
    ...))`` — one py4j round trip per float, ~0.5 ms each, ALL driver
    time, paid at every DataFrame *construction* (measured r11: 0.76 s
    for a 4×6×64 plane set; sim_ann_lsh built two of those per
    invocation, so ~1.6 s of its 2.9 s wall was building the plan, not
    running it). And any per-element tree (F.lit or a parsed
    ``array(array(...))``) stays ~1,500 unresolved nodes that EVERY
    downstream transformation re-analyzes — 0.13 s per chained
    select/join at this size, because PySpark Datasets analyze eagerly
    and analysis caches per-Dataset, not per-subtree.

    Fast path: ship the values as one JSON string, let the optimizer
    constant-fold ``from_json`` (one Jackson parse in the JVM), and lift
    the folded Literal out of the optimized 1-row plan — ~0.03 s to
    build and O(1) to re-analyze. Bit-equality with F.lit is pinned by
    tests/test_nested_lit.py (every shipped matrix family plus
    subnormal/extreme/−0.0 adversarial values): ``json.dumps`` emits
    repr's shortest round-trip decimals and Jackson parses
    correctly-rounded, so the doubles are identical, not just close.

    The lift touches two stable-for-years internals
    (``queryExecution().optimizedPlan()``, classic
    ``ExpressionUtils.column``); if either moves, or the fold ever
    yields a non-Literal, we fall back to the same values rendered as
    one ``array(array(...))D`` SQL parse — value-identical (also
    pinned), just slower to re-analyze. Finite values only: an inf/nan
    is rejected up front (json.dumps emits Infinity/NaN, which is not
    JSON and from_json would NULL the whole matrix silently)."""
    import json as _json

    depth, probe = 0, obj
    while isinstance(probe, (list, tuple)):
        depth += 1
        probe = probe[0]
    typ = elem_sql_type
    for _ in range(depth):
        typ = f"array<{typ}>"

    def render(o) -> str:
        if isinstance(o, (list, tuple)):
            return "array(" + ",".join(render(e) for e in o) + ")"
        if elem_sql_type == "bigint":
            return str(int(o)) + "L"
        v = float(o)
        if v != v or v in (float("inf"), float("-inf")):
            raise ValueError("nested_double_lit requires finite values")
        return repr(v) + "D"

    try:
        payload = _json.dumps(obj, allow_nan=False)
        spark = SparkSession.getActiveSession()
        df = spark.sql(f"SELECT from_json('{payload}', '{typ}') AS c")
        jlit = df._jdf.queryExecution().optimizedPlan().expressions().apply(0).child()
        # a malformed payload would PERMISSIVE-null the whole matrix —
        # treat a non-Literal OR null fold as "fast path unavailable"
        if jlit.getClass().getSimpleName() != "Literal" or jlit.value() is None:
            raise AssertionError("from_json did not constant-fold to a value")
        # re-type with containsNull=false at every level: from_json's
        # parsed type says nullable elements, F.lit's says non-null —
        # the values carry no nulls, and the schema must match the
        # F.lit form exactly (tests assert dataType equality)
        jdt = (
            spark._jvm.org.apache.spark.sql.types.DataTypes.LongType
            if elem_sql_type == "bigint"
            else spark._jvm.org.apache.spark.sql.types.DataTypes.DoubleType
        )
        for _ in range(depth):
            jdt = spark._jvm.org.apache.spark.sql.types.DataTypes.createArrayType(jdt, False)
        jlit = spark._jvm.org.apache.spark.sql.catalyst.expressions.Literal(jlit.value(), jdt)
        jcol = spark._jvm.org.apache.spark.sql.classic.ExpressionUtils.column(jlit)
        nested_double_lit.last_path = "fold"
        return Column(jcol)
    except ValueError:
        raise
    except Exception:
        nested_double_lit.last_path = "render"
        return F.expr(render(obj))


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Spread a small scan across the cores before compute-heavy per-row
    work (signature/code/distance derivations that cost ≫ the row bytes).

    A bounded corpus (the ANN/all-pairs baselines) usually arrives as ONE
    parquet row group, so every derivation chained on the scan runs as a
    single task regardless of cluster size — measured r11: the whole ANN
    encode/assign family was single-threaded at sf0.1 (guide §2.2
    "scale-adaptive partitioning"). Round-robin repartition to
    defaultParallelism fixes that for ~1 MB of shuffle.

    Scale-adaptive by construction: a corpus big enough to matter at
    100 TB scans as thousands of row-group partitions, the guard sees
    partitions ≥ cores, and this is a no-op — the repartition exists
    exactly when the scan is too small to parallelize itself. (AQE can't
    help here: its byte-based coalescing would *merge* these partitions,
    byte size being the wrong cost model for compute-bound stages.)

    Applies ONLY to scan-shaped inputs (scan/filter/project, no shuffle
    upstream): the partition probe is `df.rdd.getNumPartitions()`, and
    under AQE converting a shuffling plan to an RDD MATERIALIZES its
    query stages — an eager hidden job at plan-construction time
    (measured r11: +12 s cold on a windowed-sample input) — while tiny
    derived inputs also make the extra round-robin exchange a net loss
    (sim_ann_ivf 2.3→3.3 s warm; both sites reverted, see
    OPTIMIZATION_r11.md). r12 (VERDICT r11 #4): the contract is now
    MECHANICAL, not a docstring convention — the analyzed logical plan
    is walked (driver-side tree inspection, no job) and anything
    beyond scan/filter/project/alias nodes makes the helper a NO-OP
    before the `.rdd` probe is ever touched, so a future call site on
    a shuffling input degrades to "not spread" instead of silently
    re-triggering the hidden-job hazard
    (tests/test_similarity_unroll.py::test_spread_refuses_shuffling_input)."""
    if not _scan_shaped(df):
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


# analyzed-plan node classes that cannot hide an upstream shuffle or an
# eager AQE query stage: pure per-row pipelining over a source scan
_SCAN_SHAPED_NODES = frozenset(
    {
        "Project",
        "Filter",
        "LogicalRelation",  # DataSource v1 file scan
        "DataSourceV2Relation",
        "DataSourceV2ScanRelation",
        "SubqueryAlias",
        "View",
    }
)


def _scan_shaped(df: DataFrame) -> bool:
    """True iff every node of the ANALYZED logical plan is a
    scan/filter/project/alias — the only shapes `spread_small_scan` may
    `.rdd`-probe and repartition (see its docstring). Walks the JVM
    plan tree directly: O(nodes) py4j calls, no Spark job."""

    def walk(p) -> bool:
        if p.getClass().getSimpleName() not in _SCAN_SHAPED_NODES:
            return False
        ch = p.children()
        return all(walk(ch.apply(i)) for i in range(ch.size()))

    return walk(df._jdf.queryExecution().analyzed())


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product. With `dim` (the statically-known vector width) the
    sum unrolls to `dim` multiply-adds — ordinary codegen'd arithmetic.
    Without it, the higher-order-function form is CodegenFallback:
    interpreted per element with closure/boxing overhead, ~10× slower in
    the pair-scoring hot loops (guide §1.2 "per-task work"; measured
    r11: all-pairs cosine 40.8 s → 12.6 s, byte-identical output).

    Value identity: both forms fold left-to-right from 0.0 with the same
    type promotions (((0.0 + a₁·b₁) + a₂·b₂) + …), so IEEE results are
    bit-equal. `F.get` (0-based, NULL on out-of-range in ANSI and
    non-ANSI alike) mirrors zip_with's null padding: a too-short array
    yields NULL either way.

    WHEN to pass dim (measured r11, OPTIMIZATION_r11.md): only on
    high-pair-volume scoring paths (all-pairs baselines, LSH-bucket
    verify joins — ≥10⁶ evaluations). The unrolled tree is ~400 plan
    nodes vs ~10, costing ~0.5-1 s of Catalyst+codegen per query and
    duplicating each argument expression 3·dim times — a measured NET
    LOSS for small candidate sets (IVF probes, top-k reranks), which
    keep the compact HOF form. Never pass dim unless it equals the true
    vector width: the unrolled form sums only the first `dim` elements."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )
    an, bn = _plain_name(a), _plain_name(b)
    if an and bn:
        return F.expr(_dot_sql(an, bn, dim))
    e: Column = F.lit(0.0)
    for i in range(dim):
        e = e + F.get(a, i) * F.get(b, i)
    return e


def _plain_name(c: Column) -> str | None:
    """The bare column name when `c` is a plain reference, else None —
    gate for rendering an unrolled kernel as ONE SQL string instead of
    per-operator py4j calls (the 64-dim unrolled cosine is ~450 Column
    ops ≈ 0.6 s of pure DRIVER time per call site per invocation,
    measured r11; one F.expr parse of the identical text is ~5 ms).
    Renders only what is provably a simple identifier; every other
    shape keeps the Column-composition path."""
    m = re.fullmatch(r"Column<'([A-Za-z_][A-Za-z0-9_]*)'>", str(c))
    return m.group(1) if m else None


# Whole-stage-codegen EJECTOR seed (r12): `aggregate` is a higher-order
# function, i.e. CodegenFallback — ANY expression containing one
# disqualifies its operator from whole-stage codegen, so the operator
# runs standalone with its OWN generated projection, where expressions
# split into <8 KB methods bound to the input row and HotSpot JITs
# them. Folding an EMPTY array returns the zero element, so this IS
# bit-exact 0.0D (validated: SELECT aggregate(array(), 0.0D,
# (acc,v)->acc) = 0.0) and the per-row cost is one empty fold. Used to
# seed the unrolled dot in O(n²) pair-scoring projections: fused into
# the join's whole-stage method the ~dim-term chain either overflows
# janino's 64 KB limit (a failed compile retried on EVERY execution —
# the r11 residual tax) or compiles into one >8 KB method HotSpot
# never JITs (measured r12: 3× SLOWER than the failed-compile
# fallback). The session-wide escape
# (spark.sql.codegen.hugeMethodLimit=8000) was measured and REJECTED:
# it costs 5-15% on ordinary bench members (interleaved A/B ×2,
# OPTIMIZATION_r12.md).
_EJECT_SEED_SQL = "aggregate(array(), 0.0D, (acc, v) -> acc)"


def _dot_sql(an: str, bn: str, dim: int, seed: str = "0.0D") -> str:
    """Text form of the unrolled dot — token-for-token the tree the
    Column loop builds (same left fold from 0.0D, same get() calls), so
    the analyzed plans and therefore the results are identical
    (tests/test_similarity_unroll.py pins text↔Column↔HOF equality).
    ``seed`` replaces the literal zero (see _EJECT_SEED_SQL)."""
    e = seed
    for i in range(dim):
        e = f"({e} + (get({an}, {i}) * get({bn}, {i})))"
    return e


def _norm_sql(an: str, dim: int) -> str:
    e = "0.0D"
    for i in range(dim):
        e = f"({e} + (get({an}, {i}) * get({an}, {i})))"
    return f"SQRT({e})"


def norm(a: Column, dim: int | None = None) -> Column:
    """L2 norm; same unrolled-vs-HOF contract as `dot` (identical left
    fold from 0.0, so values are bit-equal either way)."""
    if dim is None:
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    an = _plain_name(a)
    if an:
        return F.expr(_norm_sql(an, dim))
    e: Column = F.lit(0.0)
    for i in range(dim):
        x = F.get(a, i)
        e = e + x * x
    return F.sqrt(e)


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    # zero-magnitude vectors (quantize_embeddings handles them too) get
    # similarity 0.0 instead of an ANSI DIVIDE_BY_ZERO that would kill
    # every cosine-based operator on one bad embedding
    an, bn = (_plain_name(a), _plain_name(b)) if dim else (None, None)
    if dim and an and bn:
        # one parse of the exact tree the Column form composes (~450
        # py4j round trips ≈ 0.6 s driver time saved per call site)
        d = f"({_norm_sql(an, dim)} * {_norm_sql(bn, dim)})"
        return F.expr(
            f"CASE WHEN ({d} != 0) THEN ({_dot_sql(an, bn, dim)} / {d}) "
            f"ELSE 0.0D END"
        )
    d = norm(a, dim) * norm(b, dim)
    return F.when(d != 0, dot(a, b, dim) / d).otherwise(F.lit(0.0))


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column, dim: int | None = None) -> Column:
    """`cosine(a, b, dim)` with the two L2 norms read from columns
    computed BEFORE a pair join instead of re-derived per pair (r12,
    VERDICT r11 #5 — guide §1.2 "don't compute things you throw away").

    On an O(n²) pair-scoring stage the norms are a per-ROW property
    recomputed per PAIR: 2·n² norm folds where 2·n suffice — at sf0.1's
    2M pairs that is ~2/3 of the stage's arithmetic. It is also the
    janino fix: the r11 unrolled `cosine` inlined dot + both norms
    (~3·dim get() terms) into the fused BNLJ consume method, which
    overflowed janino's 64 KB limit, so the FAILED whole-stage compile
    was retried on every execution and the stage ran interpreted. The
    pair stage now carries only the dot chain (~dim terms) — it
    compiles, and the norm folds run once per row on the pre-join
    projections.

    Value identity: the norm columns are the SAME `norm()` expression
    evaluated on the same row values (IEEE-deterministic), and this
    builds the SAME `CASE WHEN (na*nb != 0) THEN dot/(na*nb) ELSE 0.0`
    tree as `cosine` — results are bit-equal, pinned by
    tests/test_similarity_unroll.py."""
    names = [_plain_name(c) for c in (a, b, na, nb)] if dim else [None]
    if dim and all(names):
        an, bn, nan_, nbn = names
        d = f"({nan_} * {nbn})"
        return F.expr(
            f"CASE WHEN ({d} != 0) THEN "
            f"({_dot_sql(an, bn, dim, seed=_EJECT_SEED_SQL)} / {d}) "
            f"ELSE 0.0D END"
        )
    d = na * nb
    if dim:
        # Column fallback keeps the same eject-seeded left fold
        e: Column = F.expr(_EJECT_SEED_SQL)
        for i in range(dim):
            e = e + F.get(a, i) * F.get(b, i)
        return F.when(d != 0, e / d).otherwise(F.lit(0.0))
    return F.when(d != 0, dot(a, b, dim) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
    hoist_norms: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query. Output: (query_id, neighbor_id,
    cos_sim, rank). Self-matches excluded. Pass `dim` when the vector
    width is statically known — the scoring loop then runs as codegen'd
    arithmetic instead of interpreted HOFs (see `dot`).

    `hoist_norms` (r12, measured decision — the `dim` convention):
    norms computed once per row on the side selects instead of per
    pair. WINS on single/few-partition sample inputs where one task
    scores a dense pair block (sim_knn_eval 1.31→0.96, sim_ranking_
    metrics 1.50→1.05 warm, interleaved ×2); LOSES ~10-18% on the
    spread-corpus × tiny-query-set shape (sim_topk 0.71→0.79,
    sim_hybrid_rrf 1.23→1.48) where per-task pair blocks are small and
    the per-row fold + wider rows outweigh the per-pair savings —
    those call sites pass False and keep their r11-measured shape."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        *([norm(F.col(vec_col), dim).alias("_nq")] if hoist_norms else []),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        *([norm(F.col(vec_col), dim).alias("_nc")] if hoist_norms else []),
    )
    score = (
        cosine_from_norms(F.col("qv"), F.col("cv"), F.col("_nq"), F.col("_nc"), dim)
        if hoist_norms
        else cosine(F.col("qv"), F.col("cv"), dim)
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(score, 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def maxsim_topk(
    doc_vecs: DataFrame,
    query_vecs: DataFrame,
    doc_col: str = "doc_id",
    vec_col: str = "vec",
    k: int = 5,
    pos_col: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) top-k over MULTI-vector
    documents: score(q, d) = Σ_{qv∈q} max_{dv∈d} cosine(qv, dv). The
    retrieval shape for token-level embedding search — one vector per
    token/patch instead of one pooled vector per document.

    Plan: the query side (a handful of docs × vectors) broadcasts; every
    corpus vector is scored JVM-side (zip_with/aggregate — no Python),
    then TWO map-side-combined aggregates fold the (query, doc, qvec)
    maxes and the per-(query, doc) sum. Shuffle rows are slim
    (ids + one double); the corpus scan is embarrassingly parallel, so
    the shape holds at 100 TB of vectors. Self-matches excluded.

    Output: (query_id, doc_id, score, rank) — score rounded to 6 before
    ranking so engine-side float noise cannot flip rank boundaries.
    """
    qpos = (
        F.col(pos_col) if pos_col is not None else F.monotonically_increasing_id()
    )
    # norms hoisted to the per-row selects (r12) — same rationale as
    # brute_force_topk: the guard's norm folds were paid per (qvec,
    # corpus-vector) pair, twice each on the interpreted path
    q = query_vecs.select(
        F.col(doc_col).alias("query_id"),
        qpos.alias("_qpos"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col), dim).alias("_nq"),
    )
    d = doc_vecs.select(
        F.col(doc_col).alias("doc_id"),
        F.col(vec_col).alias("_dv"),
        norm(F.col(vec_col), dim).alias("_nd"),
    )
    per_qvec = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id", "_qpos")
        .agg(
            F.max(
                cosine_from_norms(
                    F.col("_qv"), F.col("_dv"), F.col("_nq"), F.col("_nd"), dim
                )
            ).alias("_mx")
        )
    )
    scores = per_qvec.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("_mx"), 6).alias("score")
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    z_threshold: float = 2.5,
) -> DataFrame:
    """Corpus-hygiene outlier scoring for an embedding column: distance
    to the global centroid, z-scored over the corpus — flags corrupt /
    out-of-distribution vectors before they poison ANN indexes or
    semantic dedup.

    Scale shape: the centroid is a posexplode → groupBy(dim) average —
    map-side combined, so the shuffle carries ~64 rows per partition
    regardless of corpus size — folded back into ONE array row and
    broadcast; distances are then a single narrow JVM pass (zip_with +
    aggregate), and the (mean, stddev) normalizer is another 1-row
    broadcast. No driver-side collect anywhere.

    Output: (id, dist, z, is_outlier), dist/z rounded to 6.
    """
    v = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    ex = v.select("_id", F.posexplode("_v").alias("_pos", "_x"))
    cent = (
        ex.groupBy("_pos")
        .agg(F.avg("_x").alias("_m"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
                lambda s: s["_m"],
            ).alias("_c")
        )
    )
    dists = v.crossJoin(F.broadcast(cent)).select(
        "_id",
        F.sqrt(
            F.aggregate(
                F.zip_with("_v", "_c", lambda x, m: (x - m) * (x - m)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            )
        ).alias("_dist"),
    )
    stats = dists.agg(
        F.avg("_dist").alias("_mu"), F.stddev_samp("_dist").alias("_sd")
    )
    z = (F.col("_dist") - F.col("_mu")) / F.col("_sd")
    return dists.crossJoin(F.broadcast(stats)).select(
        F.col("_id").alias(id_col),
        F.round("_dist", 6).alias("dist"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > z_threshold).alias("is_outlier"),
    )


def hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> list[list[list[float]]]:
    """Deterministic random hyperplanes [table][plane][dim] (seeded —
    reproducible across runs and executors; shipped as literals, i.e. a
    broadcast of ~tables*planes*dim floats)."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def _bucket_of(vec: Column, planes_col: Column) -> Column:
    """Bucket id = sign-bit string of the vector against each plane in
    `planes_col` (array<array<double>>). Plane p contributes bit 1<<p when
    the projection is non-negative — identical semantics to summing
    per-plane literals, but expressed over an array column so the whole
    signature is a handful of Catalyst nodes."""
    return F.aggregate(
        F.transform(
            planes_col,
            lambda plane, p: F.when(
                F.aggregate(
                    F.zip_with(vec, plane, lambda x, wgt: x * wgt),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                >= 0,
                F.call_function("shiftleft", F.lit(1), p),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, b: acc + b,
    )


def _signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id for ONE hyperplane table, shipped as a single nested-array
    literal (one Catalyst Literal node instead of planes*dim nodes — the
    naive per-float F.lit form costs seconds of driver-side plan compile at
    production plane counts)."""
    return _bucket_of(vec, nested_double_lit(planes))


def _signatures_all(vec: Column, tables: list[list[list[float]]]) -> Column:
    """array<struct<tbl,bucket>> — every table's signature in one compact
    expression over a single triple-nested literal. Replaces the per-table
    F.array(F.struct(...)) explosion that dominated plan-compile time."""
    lit = nested_double_lit(tables)
    return F.transform(
        lit,
        lambda planes, t: F.struct(
            t.alias("tbl"), _bucket_of(vec, planes).alias("bucket")
        ),
    )


def lsh_ann_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: per-table bucket join → exact cosine re-rank within
    candidates. Only bucket-colliding pairs are scored — at scale this is
    the difference between O(N·Q) and O(N·Q/2^planes · tables)."""
    tables = hyperplanes(dim, n_planes, n_tables, seed)

    def bucketize(df: DataFrame, side: str) -> DataFrame:
        sig = F.explode(_signatures_all(F.col(vec_col), tables)).alias("_s")
        return df.select(
            F.col(id_col).alias(f"{side}_id"), F.col(vec_col).alias(f"{side}_v"), sig
        ).select(
            f"{side}_id", f"{side}_v", F.col("_s.tbl").alias("tbl"), F.col("_s.bucket").alias("bucket")
        )

    qb = bucketize(queries, "q")
    # r11: corpus-side signature derivation is the heavy per-row work —
    # spread the scan so it parallelizes (see spread_small_scan)
    cb = bucketize(spread_small_scan(candidates), "c")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.col("q_v").alias("qv"),
            F.col("c_v").alias("cv"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("cv"), dim), 6).alias("cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    scope: Column | None = None,
    max_unscoped_rows: int | None = 1_000_000,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold).
    All-pairs within an optional blocking `scope` column (e.g. a coarse
    LSH bucket or label) — at 100 TB ALWAYS block first; the unblocked
    form is the sf-scale oracle baseline.

    The unscoped form broadcasts the b side, so its failure mode on an
    oversized input is a broadcast-build OOM, not the old slow-but-
    progressing CartesianProduct — `max_unscoped_rows` (ADVICE r9)
    guards that with a LIMIT-bounded count and an actionable error
    (use `scope`/lsh_cosine_dup_pairs, or None to disable).

    NOTE (ADVICE r10): the unscoped guard is an EAGER Spark action
    (limit(cap+1).count()) at DataFrame-construction time — plan-only
    consumers of the unscoped form trigger that O(cap)-row scan on
    every call; pass max_unscoped_rows=None (or `scope`) to stay lazy."""
    # norms are a per-ROW property: compute them on the O(n) side
    # selects, not per PAIR inside the O(n²) join stage (r12 — see
    # cosine_from_norms; also shrinks the pair stage's generated code
    # under janino's 64 KB whole-stage limit, so it compiles again)
    a = df.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col), dim).alias("_na"),
        *([scope.alias("_scope")] if scope is not None else []),
    )
    b = df.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col), dim).alias("_nb"),
        *([scope.alias("_scope")] if scope is not None else []),
    )
    # unscoped all-pairs (the documented sf-scale baseline ONLY): the b
    # side broadcasts explicitly — with the shipped static-threshold-off
    # policy an un-hinted cross join plans CartesianProduct; the pin
    # keeps the BroadcastNestedLoopJoin shape at baseline scales and is
    # adjudicated as an sf_scaled pin because this form must never run
    # unblocked at corpus scale anyway (pass `scope`)
    if scope is not None:
        joined = a.join(b, ["_scope"])
    else:
        if (
            max_unscoped_rows is not None
            and df.limit(max_unscoped_rows + 1).count() > max_unscoped_rows
        ):
            raise ValueError(
                f"cosine_dup_pairs without `scope` broadcasts the full "
                f"input and it exceeds {max_unscoped_rows} rows — the "
                f"all-pairs baseline would die building the broadcast. "
                f"Block first: pass `scope` or use lsh_cosine_dup_pairs "
                f"(or raise max_unscoped_rows if it genuinely fits)."
            )
        # r11: spread the probe side across the cores BEFORE the
        # nested-loop join. The probe input is typically one small scan
        # partition (the bounded all-pairs corpus fits one file), so the
        # O(n²) pair scoring otherwise runs as a SINGLE task — measured
        # 17.2 s → 2.55 s warm at sf0.1 (2M pairs) from this line alone.
        # The count must be explicit (defaultParallelism, i.e. the
        # core count locally / total executor cores on a cluster): a
        # bare repartition() is AQE-coalesced back to one partition
        # because byte-based sizing is the wrong signal for a
        # compute-bound nested-loop stage (2000 rows ≈ 1 MB but 2M
        # cosine evaluations).
        joined = a.repartition(
            df.sparkSession.sparkContext.defaultParallelism
        ).crossJoin(F.broadcast(b))
    return (
        joined.filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(
                cosine_from_norms(
                    F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb"), dim
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_cosine_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 3,
    n_tables: int = 8,
    seed: int = 42,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by hyperplane-LSH bucket —
    the scale path for `cosine_dup_pairs` (which is all-pairs unless given
    a scope). Only pairs colliding in ≥1 of `n_tables` bucket tables are
    scored, so the candidate set is O(N²·tables/2^planes) instead of
    O(N²), then an exact cosine verify applies `threshold`.

    Plan shape (mirrors dedup.minhash_lsh_pairs): slim (id, tbl, bucket)
    table persisted once (signatures are higher-order-fn expressions that
    Catalyst will not CSE across a self-join), oversized buckets dropped
    (`max_bucket` bounds the pair explosion under skew), pair join carries
    ids only, vectors re-attached just for the verify.

    Recall is (1-θ/π)^planes per table; size `n_planes` with
    estimate_bucket_width at production N. The defaults (3, 8) are tuned
    for the synthetic corpus whose "dups" sit at cos 0.4-0.51 (θ≈60°,
    the hardest regime) — at a production near-dup threshold (≥0.9,
    θ≤26°) the same structure holds ≥0.93 recall with 8+ planes and a
    far smaller candidate set."""
    tables = hyperplanes(dim, n_planes, n_tables, seed)
    bucketed = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_signatures_all(F.col(vec_col), tables)).alias("_s"),
    ).select("_id", F.col("_s.tbl").alias("tbl"), F.col("_s.bucket").alias("bucket"))
    bucketed = bucketed.persist()
    bucket_sizes = bucketed.groupBy("tbl", "bucket").agg(F.count("*").alias("_n"))
    bucketed = bucketed.join(
        bucket_sizes.filter(F.col("_n") > max_bucket), ["tbl", "bucket"], "left_anti"
    )
    pairs = (
        bucketed.select("tbl", "bucket", F.col("_id").alias("a"))
        .join(bucketed.select("tbl", "bucket", F.col("_id").alias("b")), ["tbl", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    # norm computed once per corpus row on the vector map, not per
    # candidate pair in the verify stage (r12 — see cosine_from_norms)
    vmap = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col), dim).alias("_n"),
    )
    return (
        pairs.join(
            vmap.select(
                F.col("_id").alias("a"), F.col("_v").alias("va"), F.col("_n").alias("_na")
            ),
            "a",
        )
        .join(
            vmap.select(
                F.col("_id").alias("b"), F.col("_v").alias("vb"), F.col("_n").alias("_nb")
            ),
            "b",
        )
        .select(
            "a",
            "b",
            F.round(
                cosine_from_norms(
                    F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb"), dim
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def fit_quantizer(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    seed: int = 42,
    max_sample: int = 4096,
    n_iter: int = 20,
) -> list[list[float]]:
    """Coarse k-means quantizer fit on a bounded DETERMINISTIC sample —
    the FAISS-style production design: quantizer training is a driver-side
    problem on O(cells·256) sampled vectors (one bounded collect, the only
    one in this module); cell ASSIGNMENT — the corpus-scale work — stays a
    JVM-side argmin over centroid literals. Sample membership is
    xxhash64-ranked (pure function of id — reproducible regardless of
    partitioning), init is seeded k-means++, iteration is vectorized
    numpy Lloyd. Deterministic end to end."""
    import numpy as np

    sample = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_id").cast("string"), F.lit(seed)), F.col("_id"))
        .limit(max_sample)
        .collect()
    )
    x = np.array([r["_v"] for r in sample], dtype=np.float64)
    rng = np.random.RandomState(seed)
    # k-means++ seeding
    centers = [x[rng.randint(len(x))]]
    for _ in range(1, min(n_cells, len(x))):
        d2 = np.min(
            [((x - c) ** 2).sum(axis=1) for c in centers], axis=0
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centers.append(x[rng.choice(len(x), p=probs)])
    c = np.array(centers)
    for _ in range(n_iter):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        newc = np.array(
            [x[assign == j].mean(axis=0) if (assign == j).any() else c[j] for j in range(len(c))]
        )
        if np.allclose(newc, c):
            break
        c = newc
    return [list(map(float, row)) for row in c]


def _cell_dists(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<d,cell>>: squared L2 distance from `vec` to every
    centroid. Centroids ship as ONE nested-array literal, so the whole
    n_cells*dim distance computation is a few Catalyst nodes — the naive
    per-float F.lit form built a >1000-node tree that cost ~3 s of
    driver-side compile per query at 16x64."""
    return F.transform(
        nested_double_lit(centroids),
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            i.alias("cell"),
        ),
    )


def ivf_ann_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer assigns every
    candidate to a cell; each query probes its n_probe nearest cells and
    re-ranks exactly within them. The industrial scale path when trained
    centroids are available (vs hyperplane LSH which needs no training).

    Implementation: quantizer fit by fit_quantizer (driver-side seeded
    k-means on a bounded deterministic sample — see its docstring for why
    that is the 10⁹-vector design); cell assignment is a JVM-side argmin
    over centroid literals, so the operator composes as a plain DataFrame
    function with no ML-fit job in the serving path."""
    centroids = fit_quantizer(candidates, id_col, vec_col, n_cells, seed)

    def nearest_cells(df: DataFrame, side: str, n: int) -> DataFrame:
        top = F.slice(F.array_sort(_cell_dists(F.col(vec_col), centroids)), 1, n)
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_v"),
            F.explode(top).alias("_c"),
        ).select(f"{side}_id", f"{side}_v", F.col("_c.cell").alias("cell"))

    cb = nearest_cells(candidates, "c", 1)  # candidates live in ONE cell
    qb = nearest_cells(queries, "q", n_probe)  # queries probe several
    cand = (
        cb.join(F.broadcast(qb), "cell")
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.round(cosine(F.col("q_v"), F.col("c_v"), dim), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/IO lever for
    a 100 TB embedding corpus (4× smaller than float32, 8× than float64;
    dot products on int8 stay SIMD-friendly downstream). Each vector
    stores one float scale = max(|x|)/127 and q[i] = round(x[i]/scale),
    clamped to [-127, 127]; zero vectors quantize to all-zero with scale
    0. Pure column expressions (transform/aggregate) — zero shuffle,
    scan-speed, and exactly reproducible in any engine (no RNG).

    Output: (id, scale, qvec array<int>, max_abs_err) where max_abs_err
    is the per-vector reconstruction error bound actually achieved —
    always ≤ scale/2."""
    absmax = F.aggregate(
        F.col(vec_col), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    # The internal name "_scale" must differ from the OUTPUT alias "scale":
    # Spark resolves a reference appearing after `round(..) AS scale` in the
    # same select list to that LATERAL ALIAS (the rounded value), silently
    # shadowing the input column of the same name — qvec/err would then be
    # computed against the rounded scale.
    d = df.select(
        F.col(id_col), F.col(vec_col).alias("_v"), (absmax / 127.0).alias("_scale")
    )
    q = F.transform(
        F.col("_v"),
        lambda x: F.when(F.col("_scale") == 0.0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.round(x / F.col("_scale")).cast("int")),
            )
        ),
    )
    err = F.aggregate(
        F.zip_with(
            F.col("_v"),
            q,
            lambda xv, qi: F.abs(xv - qi.cast("double") * F.col("_scale")),
        ),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
    return d.select(
        id_col,
        F.round(F.col("_scale"), 9).alias("scale"),
        q.alias("qvec"),
        F.round(err, 9).alias("max_abs_err"),
    )


def estimate_bucket_width(n_vectors: int, target_bucket: int = 1 << 14) -> int:
    """Planes needed so expected bucket size ≈ target (capacity planning
    helper for the 100 TB path)."""
    return max(1, int(math.ceil(math.log2(max(n_vectors / target_bucket, 2)))))


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal over
    an embedding column. A seeded k-means coarse quantizer assigns every
    vector to a cell; cosine pairs are scored ONLY within a cell; any id
    that pairs (cos >= threshold) with a smaller id is marked a duplicate
    (keep-smallest-id — deterministic, matching keep_survivors).

    Emits every input row as (id, cell, centroid_sim, is_dup) so the
    caller can either filter survivors or audit what was dropped.

    Scale shape: the pair stage is cosine_dup_pairs scoped by cell —
    pair work is sum(|cell|^2) instead of N^2, and cells are sized
    n_cells ~= sqrt(N). The quantizer is fit by fit_quantizer
    (driver-side seeded k-means on a bounded deterministic sample — the
    10^9-vector design); assignment stays JVM-side. Cross-cell near-dups
    are the recall loss the paper accepts; tighten by raising n_cells
    more slowly than N or probing neighbor cells. The quantizer is
    impl-defined, so certification is rows-only + planted-duplicate and
    cross-run-determinism pytests rather than a DuckDB oracle."""
    centroids = fit_quantizer(df, id_col, vec_col, n_cells, seed)
    best = F.element_at(F.array_sort(_cell_dists(F.col(vec_col), centroids)), 1)
    # r11: cell assignment (n_cells×dim distance per row) is the heavy
    # corpus-side pass — spread the scan (see spread_small_scan); the
    # quantizer fit above samples from the UNspread df (bounded
    # xxhash64-ranked sample), so centroids are unaffected
    cells = spread_small_scan(df).select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).alias(vec_col),
        best["cell"].alias("cell"),
    ).persist()
    cent_lit = F.lit(centroids)
    pairs = cosine_dup_pairs(
        cells, id_col=id_col, vec_col=vec_col, threshold=threshold, scope=F.col("cell"),
        dim=dim,
    )
    losers = pairs.select(F.col("b").alias(id_col)).distinct()
    return (
        cells.join(losers.withColumn("_dup", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cell",
            F.round(cosine(F.col(vec_col), F.element_at(cent_lit, F.col("cell") + 1), dim), 6).alias(
                "centroid_sim"
            ),
            F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"),
        )
    )


def fit_pq(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    max_sample: int = 4096,
    n_iter: int = 20,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split `dim` into `m` subspaces and
    k-means each on the same bounded deterministic sample fit_quantizer
    uses (driver-side numpy on O(sample·dim) floats; corpus-scale encode
    stays JVM-side). Returns [m][ksub][dim/m] centroids. 8×16 on 64-d
    compresses 256-byte float vectors to 8 one-byte codes (32×) — the
    FAISS IVF-PQ memory model that lets 10⁹-vector indexes fit in RAM."""
    import numpy as np

    assert dim % m == 0, "dim must divide into m subspaces"
    dsub = dim // m
    sample = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_id").cast("string"), F.lit(seed)), F.col("_id"))
        .limit(max_sample)
        .collect()
    )
    x = np.array([r["_v"] for r in sample], dtype=np.float64)
    books: list[list[list[float]]] = []
    for mi in range(m):
        xs = x[:, mi * dsub : (mi + 1) * dsub]
        rng = np.random.RandomState(seed + mi)
        centers = [xs[rng.randint(len(xs))]]
        for _ in range(1, min(ksub, len(xs))):
            d2 = np.min([((xs - c) ** 2).sum(axis=1) for c in centers], axis=0)
            probs = d2 / d2.sum() if d2.sum() > 0 else None
            centers.append(xs[rng.choice(len(xs), p=probs)])
        c = np.array(centers)
        for _ in range(n_iter):
            d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            newc = np.array(
                [xs[assign == j].mean(axis=0) if (assign == j).any() else c[j] for j in range(len(c))]
            )
            if np.allclose(newc, c):
                break
            c = newc
        books.append([list(map(float, row)) for row in c])
    return books


def _pq_codes(vec: Column, codebooks) -> Column:
    """codes array<int> of length m for one vector column: per-subspace
    argmin over the codebook literal (the column form, so callers can
    fuse the encode into a wider projection — see ivfpq_topk)."""
    dsub = len(codebooks[0][0])
    return F.transform(
        nested_double_lit(codebooks),
        lambda cb, mi: F.element_at(
            F.array_sort(
                F.transform(
                    cb,
                    lambda c, ci: F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.slice(vec, mi * dsub + 1, dsub),
                                c,
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0.0),
                            lambda acc, v: acc + v,
                        ).alias("d"),
                        ci.alias("code"),
                    ),
                )
            ),
            1,
        )["code"],
    )


def pq_encode(df: DataFrame, codebooks, id_col: str, vec_col: str) -> DataFrame:
    """(id, codes array<int> of length m): per-subspace argmin over the
    codebook literal — pure codegen'd column expressions, one narrow pass
    over the corpus (the shape every 10⁹-vector encode job needs)."""
    return df.select(
        F.col(id_col).alias("_id"), _pq_codes(F.col(vec_col), codebooks).alias("codes")
    )


def pq_adc_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 50,
    seed: int = 42,
) -> DataFrame:
    """PQ + asymmetric-distance top-k: candidates are scanned as m-byte
    codes (32× less memory traffic than raw floats); each query
    precomputes an m×ksub lookup table of subspace distances, so a
    candidate's approximate distance is m table lookups instead of dim
    multiply-adds. The approximate top-`rerank` per query re-ranks with
    exact cosine on the raw vectors (the standard recall repair). Queries
    broadcast (Q ≪ N); one window for the two top-k cuts."""
    books = fit_pq(candidates, id_col, vec_col, dim, m, ksub, seed)
    dsub = dim // m
    # r11: the encode is the heavy corpus-side pass (m×ksub×dsub
    # multiply-adds + m interpreted array_sorts per row) — spread the
    # scan (see spread_small_scan; fit_pq samples from the UNspread df)
    coded = pq_encode(spread_small_scan(candidates), books, id_col, vec_col)

    qvec = F.col("_qv")
    lut = F.transform(
        nested_double_lit(books),
        lambda cb, mi: F.transform(
            cb,
            lambda c: F.aggregate(
                F.zip_with(
                    F.slice(qvec, mi * dsub + 1, dsub), c, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        ),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_lut", lut)

    adc = F.aggregate(
        F.zip_with(
            F.col("_lut"),
            F.col("codes"),
            lambda tbl, code: F.element_at(tbl, code + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wa = W.partitionBy("query_id").orderBy(F.asc("adc_d"), F.asc("_id"))
    approx = (
        coded.crossJoin(F.broadcast(q.select("query_id", "_lut")))
        .filter(F.col("_id") != F.col("query_id"))  # brute_force_topk contract
        .withColumn("adc_d", adc)
        .withColumn("_rk", F.row_number().over(wa))
        .filter(F.col("_rk") <= rerank)
        .select("query_id", F.col("_id").alias("neighbor_id"))
    )
    cand_vecs = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        approx.join(cand_vecs, "neighbor_id")
        .join(F.broadcast(q.select("query_id", "_qv")), "query_id")
        # rerank is <= `rerank` rows per query — the HOF cosine's
        # interpreted cost is negligible there, while the unrolled form
        # would add ~400 plan nodes (see dot()); keep the compact tree
        .withColumn("cos_sim", F.round(cosine(F.col("_cv"), F.col("_qv")), 6))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivfpq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 50,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: the full FAISS-style index — coarse k-means cells bound
    WHICH candidates are scanned (n_probe/n_cells of the corpus), PQ
    codes bound HOW MUCH is read per candidate (m bytes), exact cosine
    re-ranks the survivors. Cell equi-join + code scan + one window;
    at 10⁹ vectors this is the structure that serves top-k from RAM."""
    centroids = fit_quantizer(candidates, id_col, vec_col, n_cells, seed)
    books = fit_pq(candidates, id_col, vec_col, dim, m, ksub, seed)
    dsub = dim // m

    best_cell = F.element_at(F.array_sort(_cell_dists(F.col(vec_col), centroids)), 1)["cell"]
    # r11: codes + cell come out of ONE spread projection over the
    # corpus scan. The previous shape ran pq_encode and the cell
    # assignment as two separate single-task corpus passes and then
    # equi-joined them back on _id — a self-join of two derivations of
    # the same scan (one full extra pass + one shuffle for nothing).
    # The quantizer/codebook fits above sample from the UNspread df.
    coded = spread_small_scan(candidates).select(
        F.col(id_col).alias("_id"),
        _pq_codes(F.col(vec_col), books).alias("codes"),
        best_cell.alias("cell"),
    )

    qvec = F.col("_qv")
    lut = F.transform(
        nested_double_lit(books),
        lambda cb, mi: F.transform(
            cb,
            lambda c: F.aggregate(
                F.zip_with(
                    F.slice(qvec, mi * dsub + 1, dsub), c, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        ),
    )
    probe_cells = F.slice(F.array_sort(_cell_dists(qvec, centroids)), 1, n_probe)
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
        .withColumn("_lut", lut)
        .withColumn("cell", F.explode(F.transform(probe_cells, lambda s: s["cell"])))
    )

    adc = F.aggregate(
        F.zip_with(
            F.col("_lut"), F.col("codes"), lambda tbl, code: F.element_at(tbl, code + 1)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wa = W.partitionBy("query_id").orderBy(F.asc("adc_d"), F.asc("_id"))
    approx = (
        coded.join(F.broadcast(q.select("query_id", "cell", "_lut")), "cell")
        .filter(F.col("_id") != F.col("query_id"))
        .withColumn("adc_d", adc)
        .withColumn("_rk", F.row_number().over(wa))
        .filter(F.col("_rk") <= rerank)
        .select("query_id", F.col("_id").alias("neighbor_id"))
    )
    cand_vecs = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        approx.join(cand_vecs, "neighbor_id")
        .join(
            F.broadcast(
                queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
            ),
            "query_id",
        )
        .withColumn("cos_sim", F.round(cosine(F.col("_cv"), F.col("_qv")), 6))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
