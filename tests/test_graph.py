"""Graph operators: PageRank against an independent NumPy reference,
degree stats against hand-counted values."""

from __future__ import annotations

import numpy as np

from ballista_mvp_spark.operators import graph as G


def _np_pagerank(edges, iterations=5, damping=0.85):
    """Independent dense reference: same simplified-dangling rule."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for u, v in edges:
        w[idx[u], idx[v]] += 1.0
    outw = w.sum(axis=1)
    p = np.divide(w, outw[:, None], out=np.zeros_like(w), where=outw[:, None] > 0)
    r = np.ones(n)
    for _ in range(iterations):
        r = (1 - damping) + damping * (p.T @ r)
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy_reference(spark):
    # multigraph with a dangling node (4) and a duplicate edge (1->2 x2)
    edges = [(1, 2), (1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (5, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank for r in G.pagerank(df, "src", "dst").collect()}
    want = _np_pagerank(edges)
    assert set(got) == set(want)
    for node, rank in want.items():
        assert abs(got[node] - rank) < 1e-6, (node, got[node], rank)
    # sink node 4 receives but never donates; source node 5 floors at 1-d
    assert got[5] == 0.15
    assert got[3] == max(got.values())


def test_pagerank_uniform_on_cycle(spark):
    # a pure cycle is rank-uniform at exactly 1.0 regardless of iterations
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    got = {r.node: r.rank for r in G.pagerank(df, "src", "dst", iterations=3).collect()}
    assert got == {1: 1.0, 2: 1.0, 3: 1.0}


def test_degree_stats_counts_multi_edges(spark):
    df = spark.createDataFrame([(1, 2), (1, 2), (2, 3)], ["src", "dst"])
    out = {r.node: (r.out_degree, r.in_degree) for r in G.degree_stats(df).collect()}
    assert out == {1: (2, 0), 2: (1, 2), 3: (0, 1)}


def test_connected_components_labels_and_singletons(spark):
    from ballista_mvp_spark.operators import dedup as D

    # two components ({1,2,3,9} via chain incl. a cycle edge, {5,6}) plus
    # singleton 7 that never enters the iteration (edge-incident-only loop)
    edges = spark.createDataFrame(
        [(9, 3), (3, 2), (2, 1), (1, 9), (6, 5)], ["a", "b"]
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 6, 7, 9)], ["id"])
    got = {r.id: r.comp for r in D.connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_chain_converges(spark):
    from ballista_mvp_spark.operators import dedup as D

    # worst-case diameter: a 12-node chain needs ~12 propagation rounds;
    # asserts the fixpoint loop runs past a handful of iterations
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], ["a", "b"])
    nodes = spark.createDataFrame([(i,) for i in range(13)], ["id"])
    got = {r.id: r.comp for r in D.connected_components(nodes, edges).collect()}
    assert got == {i: 0 for i in range(13)}


def _uf_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def test_twophase_matches_union_find_on_random_graphs(spark):
    import random

    from ballista_mvp_spark.operators import dedup as D

    rng = random.Random(42)
    for trial in range(3):
        n = 200
        nodes = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(150 + 100 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _uf_components(nodes, edges)
        ndf = spark.createDataFrame([(i,) for i in nodes], ["id"])
        edf = spark.createDataFrame(edges, ["a", "b"])
        got = {
            r.id: r.comp for r in D.connected_components_twophase(ndf, edf).collect()
        }
        assert got == want, f"trial {trial}"


def test_twophase_long_chain_beyond_propagation_budget(spark):
    from ballista_mvp_spark.operators import dedup as D

    # a 120-edge chain has diameter 120: the plain propagation loop's
    # default 25-round budget must raise, the two-phase variant must
    # converge (O(log^2 n) rounds) and label everything with node 0
    edges = spark.createDataFrame([(i, i + 1) for i in range(120)], ["a", "b"])
    nodes = spark.createDataFrame([(i,) for i in range(121)], ["id"])
    got = {r.id: r.comp for r in D.connected_components_twophase(nodes, edges).collect()}
    assert got == {i: 0 for i in range(121)}

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(nodes, edges, max_iter=10)
