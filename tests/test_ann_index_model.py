"""Model-based property test for the persistent IVF index lifecycle
(hypothesis): random sequences of append / delete / compact against
operators/ann_index.py are mirrored in an in-memory dict model, and
after every sequence the stored index is probed EXHAUSTIVELY
(n_probe == n_cells, so the candidate set is the whole corpus and IVF
probe semantics degenerate to exact brute force) and compared
neighbor-for-neighbor, rank-for-rank, value-for-value against a pure
Python brute-force over the model.

This is the stateful complement to test_ann_index.py's example-based
flows — the same pattern that hardened the versioned table in round 8
(tests/test_versioned_model.py, VERDICT r8 next-round #5): the model
checks that arbitrary interleavings of incremental ingest, targeted
deletion (cell-partition rewrite), and compaction preserve the index's
VALUE semantics, not just the hand-written build→probe path.

Float determinism: the Python model replays the engine's EXACT fold
order — cosine is a sequential left fold of IEEE doubles
(similarity.dot/norm are F.aggregate left folds; Python's `acc += x*y`
loop is bit-identical), and the 6dp round mirrors Spark's
BigDecimal.valueOf(double).setScale(6, HALF_UP) via
Decimal(repr(x)).quantize(..., ROUND_HALF_UP) — both start from the
shortest decimal representation of the double.
"""

from __future__ import annotations

import math
import shutil
import tempfile
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ballista_mvp_spark.operators import ann_index as AI

_DIM = 4
_N_CELLS = 4
_K = 5


def _vec(i: int) -> list[float]:
    """Deterministic integer-lattice vector for id i — reproducible
    across the engine and the model without shipping floats through
    hypothesis."""
    return [float((i * 31 + 7 * j * j + 3) % 23 - 11) for j in range(_DIM)]


def _round6(x: float) -> float:
    # Spark F.round on DoubleType: BigDecimal.valueOf(x) (shortest
    # decimal repr) .setScale(6, HALF_UP). Decimal(repr(x)) is the same
    # shortest-repr starting point.
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _cosine(a: list[float], b: list[float]) -> float:
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    d = math.sqrt(na) * math.sqrt(nb)
    if d == 0:
        return 0.0
    return dot / d


def _model_topk(model: dict[int, list[float]], qid: int) -> list[tuple[int, int, float]]:
    """(neighbor_id, rank, cos_sim) — rounded-THEN-ranked, desc cos,
    asc neighbor id, exactly probe_ivf_index's window."""
    scored = [
        (_round6(_cosine(model[qid], v)), nid)
        for nid, v in model.items()
        if nid != qid
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [(nid, r + 1, cos) for r, (cos, nid) in enumerate(scored[:_K])]


_OP = st.one_of(
    st.tuples(st.just("append"), st.integers(min_value=1, max_value=6)),
    st.tuples(st.just("delete"), st.integers(min_value=0, max_value=10_000)),
    st.tuples(st.just("compact"), st.just(0)),
)


@given(ops=st.lists(_OP, min_size=1, max_size=5))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ivf_index_lifecycle_matches_model(spark, ops):
    path = tempfile.mkdtemp(prefix="annmodel_")
    try:
        model: dict[int, list[float]] = {i: _vec(i) for i in range(20)}
        next_id = 20
        base = spark.createDataFrame(
            [(i, model[i]) for i in sorted(model)],
            "vec_id long, embedding array<double>",
        )
        AI.build_ivf_index(base, path, n_cells=_N_CELLS, seed=42)

        for op, arg in ops:
            if op == "append":
                batch_ids = list(range(next_id, next_id + arg))
                next_id += arg
                for i in batch_ids:
                    model[i] = _vec(i)
                batch = spark.createDataFrame(
                    [(i, model[i]) for i in batch_ids],
                    "vec_id long, embedding array<double>",
                )
                AI.append_to_ivf_index(batch, path)
            elif op == "delete":
                ids = sorted(model)
                # pick 1-2 existing ids; keep the index non-empty (an
                # all-deleted index is a different contract — the empty
                # parquet tree has no schema to read)
                if len(ids) <= 2:
                    continue
                victims = {ids[arg % len(ids)], ids[(arg // 7) % len(ids)]}
                removed = AI.delete_from_ivf_index(spark, path, sorted(victims))
                assert removed == len(victims), (removed, victims)
                for v in victims:
                    del model[v]
            elif op == "compact":
                before, after = AI.compact_ivf_index(spark, path)
                assert after <= before
            # invariant after EVERY op: stored row count == model size
            import os as _os

            n = spark.read.parquet(_os.path.join(path, "assignments")).count()
            assert n == len(model), (op, n, len(model))

        # exhaustive probe (n_probe == n_cells => candidate set is the
        # whole corpus) against the model's brute force, for 3 query ids
        qids = sorted(model)[:3]
        queries = spark.createDataFrame(
            [(i, model[i]) for i in qids],
            "vec_id long, embedding array<double>",
        )
        got = AI.probe_ivf_index(
            spark, path, queries, k=_K, n_probe=_N_CELLS
        ).collect()
        got_by_q: dict[int, list[tuple[int, int, float]]] = {}
        for r in got:
            got_by_q.setdefault(r["query_id"], []).append(
                (r["neighbor_id"], r["rank"], r["cos_sim"])
            )
        for q in qids:
            want = _model_topk(model, q)
            assert got_by_q.get(q, []) == want, (q, got_by_q.get(q), want, ops)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@given(
    n_extra=st.integers(min_value=0, max_value=12),
    seed=st.integers(min_value=1, max_value=10_000),
)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ivfpq_exhaustive_probe_matches_model(spark, n_extra, seed):
    """The IVF-PQ index (codebooks + m-byte codes + ADC scan + exact
    re-rank) degenerates to EXACT brute force when every cell is probed
    and the re-rank pool covers the corpus (rerank >= n-1): the ADC
    stage then only orders candidates that all survive to the exact
    cosine re-rank. So the persisted-PQ plumbing — codebook fit, code
    assignment, per-query LUT, partition-pruned scan, raw-vector
    re-join — must reproduce the Python brute-force model
    value-for-value, for ANY corpus composition and quantizer seed."""
    path = tempfile.mkdtemp(prefix="pqmodel_")
    try:
        model = {i: _vec(i) for i in range(16 + n_extra)}
        base = spark.createDataFrame(
            [(i, model[i]) for i in sorted(model)],
            "vec_id long, embedding array<double>",
        )
        AI.build_ivfpq_index(
            base, path, dim=_DIM, n_cells=4, m=2, ksub=4, seed=seed
        )
        qids = sorted(model)[:3]
        queries = spark.createDataFrame(
            [(i, model[i]) for i in qids],
            "vec_id long, embedding array<double>",
        )
        got = AI.probe_ivfpq_index(
            spark, path, queries, base,
            k=_K, n_probe=4, rerank=len(model),
        ).collect()
        got_by_q: dict[int, list[tuple[int, int, float]]] = {}
        for r in got:
            got_by_q.setdefault(r["query_id"], []).append(
                (r["neighbor_id"], r["rank"], r["cos_sim"])
            )
        for q in qids:
            want = _model_topk(model, q)
            assert got_by_q.get(q, []) == want, (q, got_by_q.get(q), want)
    finally:
        shutil.rmtree(path, ignore_errors=True)
