"""Model-based property test for the versioned table (hypothesis):
random sequences of append / overwrite / delete / restore commits are
replayed against an in-memory multiset-per-version model, then EVERY
committed version is read back via time travel and compared.

This is the stateful complement to test_versioned.py's example-based
races/crashes: the model checks that the manifest chain's VALUE
semantics (snapshot isolation + time travel + no-empty-commit DELETE +
metadata-only RESTORE) hold for arbitrary interleavings, not just the
hand-written flows.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ballista_mvp_spark.sources import versioned as V

_ROWS = st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=5)

_OP = st.one_of(
    st.tuples(st.just("append"), _ROWS),
    st.tuples(st.just("overwrite"), _ROWS),
    st.tuples(st.just("delete"), st.integers(min_value=0, max_value=10)),
    st.tuples(st.just("restore"), st.integers(min_value=0, max_value=100)),
)


@given(ops=st.lists(_OP, min_size=1, max_size=6))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_versioned_time_travel_matches_model(spark, ops):
    path = tempfile.mkdtemp(prefix="vmodel_")
    model: list[list[int]] = []  # model[i] = sorted rows of version i+1
    try:
        for op, arg in ops:
            if op == "append":
                df = spark.createDataFrame([(v,) for v in arg], "v long")
                V.write_versioned(df, path, mode="append")
                prev = model[-1] if model else []
                model.append(sorted(prev + list(arg)))
            elif op == "overwrite":
                df = spark.createDataFrame([(v,) for v in arg], "v long")
                V.write_versioned(df, path, mode="overwrite")
                model.append(sorted(arg))
            elif op == "delete":
                if not model:
                    continue  # engine raises on a table with no commits
                head_before = len(model)
                new_v = V.delete_versioned(spark, path, f"v < {arg}")
                survivors = [x for x in model[-1] if not (x < arg)]
                if survivors != model[-1]:
                    # rows matched: a new version must have been committed
                    assert new_v == head_before + 1, (new_v, head_before)
                    model.append(survivors)
                else:
                    # no-empty-commit contract: head unchanged
                    assert new_v == head_before, (new_v, head_before)
            elif op == "restore":
                if not model:
                    continue
                target = 1 + (arg % len(model))
                V.restore_versioned(path, target)
                model.append(list(model[target - 1]))
        # time travel: EVERY version must read back exactly its model
        # snapshot (multiset equality on the single value column)
        for i, snap in enumerate(model, start=1):
            got = sorted(
                r["v"] for r in V.read_versioned(spark, path, version=i).collect()
            )
            assert got == snap, (i, got, snap, ops)
        # history length equals the model's commit count
        assert len(V.history(path)) == len(model)
    finally:
        shutil.rmtree(path, ignore_errors=True)


_KV = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6),       # key
              st.integers(min_value=0, max_value=99)),      # payload
    min_size=1, max_size=5,
    unique_by=lambda kv: kv[0],  # MERGE requires unique source keys
)

_KOP = st.one_of(
    st.tuples(st.just("overwrite"), _KV),
    st.tuples(st.just("append"), _KV),
    st.tuples(st.just("merge"), _KV),
    st.tuples(st.just("delete_key"), st.integers(min_value=0, max_value=6)),
)


@given(ops=st.lists(_KOP, min_size=1, max_size=6))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_versioned_merge_matches_model(spark, ops):
    """MERGE/upsert model: matched target keys are replaced by the
    source row, unmatched source keys insert, and every historical
    version still time-travels to its exact (key, payload) multiset."""
    path = tempfile.mkdtemp(prefix="vmerge_")
    model: list[list[tuple[int, int]]] = []
    try:
        for op, arg in ops:
            if op in ("overwrite", "append"):
                df = spark.createDataFrame(list(arg), "k long, p long")
                V.write_versioned(df, path, mode=op)
                prev = model[-1] if (model and op == "append") else []
                model.append(sorted(prev + list(arg)))
            elif op == "merge":
                if not model:
                    continue
                src = spark.createDataFrame(list(arg), "k long, p long")
                V.merge_versioned(spark, path, src, key="k")
                src_keys = {k for k, _ in arg}
                kept = [(k, p) for k, p in model[-1] if k not in src_keys]
                model.append(sorted(kept + list(arg)))
            elif op == "delete_key":
                if not model:
                    continue
                head_before = len(model)
                new_v = V.delete_versioned(spark, path, f"k = {arg}")
                survivors = [(k, p) for k, p in model[-1] if k != arg]
                if survivors != model[-1]:
                    assert new_v == head_before + 1
                    model.append(survivors)
                else:
                    assert new_v == head_before
        for i, snap in enumerate(model, start=1):
            got = sorted(
                (r["k"], r["p"])
                for r in V.read_versioned(spark, path, version=i).collect()
            )
            assert got == snap, (i, got, snap, ops)
        # CDF reconciliation between every consecutive version pair:
        # snapshot(i) + inserts(i->i+1) - deletes(i->i+1) == snapshot(i+1)
        # as multisets (the invariant incremental consumers rely on)
        from collections import Counter

        for i in range(1, len(model)):
            ch = V.read_changes(spark, path, i, i + 1).collect()
            acc = Counter(tuple(x) for x in model[i - 1])
            for r in ch:
                kv = (r["k"], r["p"])
                if r["_change_type"] == "insert":
                    acc[kv] += 1
                else:
                    acc[kv] -= 1
            want = Counter(tuple(x) for x in model[i])
            assert +acc == want, (i, ch, model[i - 1], model[i], ops)
    finally:
        shutil.rmtree(path, ignore_errors=True)
