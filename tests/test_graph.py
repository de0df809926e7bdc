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


def test_kcore_peels_tail_keeps_clique(spark):
    # K4 on {1,2,3,4} plus a pendant path 4-5-6: the 3-core is exactly
    # the clique (every clique node has degree 3 within it); the path
    # nodes peel off in the first two rounds (6 first, then 5)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5), (5, 6)], ["src", "dst"])
    got = {r.node: r.core_degree for r in G.kcore_peel(edges, k=3, rounds=4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_extra_rounds_are_noops_after_convergence(spark):
    # once the peel stabilizes, more rounds change nothing
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5), (5, 6)], ["src", "dst"])
    a = sorted(G.kcore_peel(edges, k=3, rounds=3).collect())
    b = sorted(G.kcore_peel(edges, k=3, rounds=6).collect())
    assert a == b


def test_kcore_empty_when_k_exceeds_max_degree(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    assert G.kcore_peel(edges, k=3, rounds=2).count() == 0


def test_label_propagation_two_cliques_with_bridge(spark):
    # two K4s {1..4} and {11..14} joined by one bridge edge 4-11: each
    # clique converges to its own minimum label (ties inside a clique
    # break to the smallest), the bridge does not merge them
    c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    edges = spark.createDataFrame(c1 + c2 + [(4, 11)], ["src", "dst"])
    got = {r.node: r.community for r in G.label_propagation(edges, iterations=4).collect()}
    assert {got[n] for n in (1, 2, 3, 4)} == {1}
    assert {got[n] for n in (12, 13, 14)} == {11}


def test_label_propagation_matches_python_reference(spark):
    # independent dense reference of the synchronous smallest-label rule
    import random
    from collections import Counter, defaultdict

    rng = random.Random(7)
    edges = {(rng.randrange(30), rng.randrange(30)) for _ in range(60)}
    edges = [(a, b) for a, b in edges if a != b]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for n in adj:
            cnt = Counter(labels[m] for m in adj[n])
            best = max(cnt.values())
            nxt[n] = min(l for l, c in cnt.items() if c == best)
        labels = nxt
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.community for r in G.label_propagation(df, iterations=3).collect()}
    assert got == labels


def test_jaccard_links_hand_computed_square(spark):
    # 4-cycle 1-2-3-4-1: the two diagonals (1,3) and (2,4) are the only
    # non-adjacent pairs; each shares BOTH neighbors -> jaccard = 2/2 = 1
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"])
    rows = {(r.a, r.b): r for r in G.jaccard_links(edges).collect()}
    assert set(rows) == {(1, 3), (2, 4)}
    for r in rows.values():
        assert (r.n_common, r.deg_a, r.deg_b) == (2, 2, 2)
        assert abs(r.jaccard - 1.0) < 1e-9


def test_jaccard_links_excludes_existing_edges(spark):
    # triangle + pendant: every co-neighbor pair is already an edge
    # except (3, 4) via shared neighbor 1
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (1, 4)], ["src", "dst"])
    rows = {(r.a, r.b): r.jaccard for r in G.jaccard_links(edges).collect()}
    assert set(rows) == {(2, 4), (3, 4)}
    # N(3)={1,2}, N(4)={1}: intersection 1, union 2
    assert abs(rows[(3, 4)] - 0.5) < 1e-9


def test_clustering_coefficients_triangle_with_pendant(spark):
    # triangle 1-2-3 + pendant edge 1-4: node 1 has deg 3 and 1 triangle
    # -> cc = 2/(3*2) = 1/3; nodes 2,3 have deg 2 -> cc = 1; node 4 has
    # deg 1 and is excluded (cc undefined)
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (1, 4)], ["src", "dst"])
    got = {r.node: r for r in G.clustering_coefficients(edges).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1].degree, got[1].n_triangles) == (3, 1)
    assert abs(got[1].local_cc - 1 / 3) < 1e-6
    assert got[2].local_cc == 1.0 and got[3].local_cc == 1.0


def test_clustering_coefficients_triangle_free_is_zero(spark):
    # star graph: center has degree 3 but no neighbor pair is adjacent
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["src", "dst"])
    got = {r.node: r.local_cc for r in G.clustering_coefficients(edges).collect()}
    assert got == {0: 0.0}


def test_personalized_pagerank_matches_numpy_reference(spark):
    edges = [(1, 2), (1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (5, 1)]
    seeds = [1, 5]
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for u, v in edges:
        w[idx[u], idx[v]] += 1.0
    outw = w.sum(axis=1)
    p = np.divide(w, outw[:, None], out=np.zeros_like(w), where=outw[:, None] > 0)
    e_s = np.array([1.0 / len(seeds) if m in seeds else 0.0 for m in nodes])
    r = e_s.copy()
    d = 0.85
    for _ in range(5):
        r = (1 - d) * e_s + d * (p.T @ r)
    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {row.node: row.rank for row in G.personalized_pagerank(df, sdf).collect()}
    for m in nodes:
        assert abs(got[m] - r[idx[m]]) < 1e-6, (m, got[m], r[idx[m]])
    # non-seed-reachable mass: node 5 has no in-edges and is not seeded
    # by teleport beyond its own seed share
    assert got[5] == round(0.15 * 0.5, 6)


def test_personalized_pagerank_rejects_empty_seeds(spark):
    import pytest as _pytest

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    empty = spark.createDataFrame([], "node long")
    with _pytest.raises(ValueError, match="empty seed set"):
        G.personalized_pagerank(edges, empty)


def test_label_propagation_string_node_ids(spark):
    """ADVICE r5: the argmax tie-break must be type-agnostic — string
    doc/url node ids propagate with ties to the lexicographically
    SMALLEST label, same rule as numeric ids."""
    c1 = [(a, b) for a in ("a1", "a2", "a3", "a4")
          for b in ("a1", "a2", "a3", "a4") if a < b]
    c2 = [(a, b) for a in ("b1", "b2", "b3", "b4")
          for b in ("b1", "b2", "b3", "b4") if a < b]
    edges = spark.createDataFrame(c1 + c2 + [("a4", "b1")], ["src", "dst"])
    got = {r.node: r.community
           for r in G.label_propagation(edges, iterations=4).collect()}
    assert {got[n] for n in ("a1", "a2", "a3", "a4")} == {"a1"}
    assert {got[n] for n in ("b2", "b3", "b4")} == {"b1"}


def test_connected_components_zero_iteration_budget_raises_cleanly(spark):
    """ADVICE r5: max_iter <= 0 must raise the documented convergence
    RuntimeError, not a NameError from the unbound loop variable."""
    import pytest as _pytest

    from ballista_mvp_spark.operators import dedup as D

    edges = spark.createDataFrame([(1, 2)], ["a", "b"])
    nodes = spark.createDataFrame([(1,), (2,)], ["id"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(nodes, edges, max_iter=0)
    assert D.connected_components.last_rounds == 0


def test_ppr_out_of_graph_seeds_keep_rank_mass(spark):
    """Seeds absent from the graph must not dilute teleport mass: ranks
    normalize over seeds-intersect-nodes, so total rank stays ~1."""
    import pytest as _pytest

    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,), (999,)], ["node"])  # 999 not in graph
    out = G.personalized_pagerank(edges, seeds, iterations=5)
    mass = sum(r.rank for r in out.collect())
    assert abs(mass - 1.0) < 1e-3, mass
    # all seeds out of graph -> loud error, not all-zero ranks
    ghost = spark.createDataFrame([(999,)], ["node"])
    with _pytest.raises(ValueError, match="no seed appears"):
        G.personalized_pagerank(edges, ghost, iterations=2)
