"""Property-based cross-checks for the graph-traversal operators: each
distributed algorithm (power-iteration PageRank with dangling-mass
correction, degree-ordered triangle counting, large-star/small-star
connected components, layer-synchronous k-hop BFS) is compared against an
independent pure-Python reference on hypothesis-generated random graphs.
The existing example tests pin hand-built graphs with known answers; these
pin the ALGORITHMS — join orientation, dangling redistribution, frontier
anti-joins — on shapes the examples don't cover (multi-edges, self-loops,
disconnected pieces, hub nodes).
"""

from __future__ import annotations

import itertools
from collections import deque

from hypothesis import given, settings
from hypothesis import strategies as st

_node = st.sampled_from([f"n{i}" for i in range(7)])
_edges = st.lists(st.tuples(_node, _node), min_size=1, max_size=15)


# ---------------------------------------------------------------------------
# pagerank vs a python power iteration replicating the operator's documented
# semantics exactly: multi-edges carry multiplicity, dangling mass is the
# deg==0 rank sum redistributed uniformly, fixed iteration count, round(6).
# ---------------------------------------------------------------------------


def _py_pagerank(edges, damping, iterations):
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    deg: dict[str, int] = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    base = (1.0 - damping) / n
    ranks = {v: 1.0 / n for v in nodes}
    dm = sum(1.0 / n for v in nodes if deg.get(v, 0) == 0)
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for a, b in edges:
            contrib[b] += ranks[a] / deg[a]
        ranks = {v: base + damping * (contrib[v] + dm / n) for v in nodes}
        dm = sum(r for v, r in ranks.items() if deg.get(v, 0) == 0)
    return {v: round(r, 6) for v, r in ranks.items()}


@settings(max_examples=15, deadline=None)
@given(edges=_edges, iterations=st.integers(min_value=0, max_value=3))
def test_pagerank_matches_python_power_iteration(spark, edges, iterations):
    from shacl_dqa_prototype_spark.operators.traversal import pagerank

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iterations=iterations).collect()}
    exp = _py_pagerank(edges, 0.85, iterations)
    assert got.keys() == exp.keys(), edges
    for v in exp:
        # both sides round(…, 6); float sum-order noise can straddle a
        # rounding boundary, so allow one ulp of the rounded grid
        assert abs(got[v] - exp[v]) <= 2e-6, (v, got[v], exp[v], edges)


# ---------------------------------------------------------------------------
# triangle_count vs brute-force enumeration of 3-node combinations over the
# simple undirected graph (self-loops and duplicate/reverse edges collapse).
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(edges=_edges)
def test_triangle_count_matches_brute_force(spark, edges):
    from shacl_dqa_prototype_spark.operators.traversal import triangle_count

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}

    und = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    exp: dict[str, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if ({frozenset((a, b)), frozenset((b, c)), frozenset((a, c))}
                <= und):
            for v in (a, b, c):
                exp[v] = exp.get(v, 0) + 1
    assert got == exp, edges


# ---------------------------------------------------------------------------
# connected_components (the DISTRIBUTED large-star/small-star fixpoint,
# driver path disabled) vs python union-find with min-representatives.
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(edges=_edges)
def test_connected_components_match_union_find(spark, edges):
    from shacl_dqa_prototype_spark.operators.connected_components import (
        connected_components,
    )

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"]
           for r in connected_components(df, driver_threshold=0).collect()}

    parent: dict[str, str] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    exp = {}
    for v in {n for e in edges for n in e}:
        root = find(v)
        if root != v:
            exp[v] = root
    assert got == exp, edges


# ---------------------------------------------------------------------------
# k_hop_reachability vs python BFS, both directed and undirected, including
# seeds absent from the edge set (hop 0 by definition).
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    edges=_edges,
    seeds=st.lists(_node, min_size=1, max_size=3, unique=True),
    k=st.integers(min_value=0, max_value=3),
    directed=st.booleans(),
)
def test_k_hop_matches_python_bfs(spark, edges, seeds, k, directed):
    from shacl_dqa_prototype_spark.operators.traversal import k_hop_reachability

    edf = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {r["node"]: r["min_hops"]
           for r in k_hop_reachability(edf, sdf, k=k, directed=directed)
           .collect()}

    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    exp = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if exp[u] == k:
            continue
        for v in adj.get(u, ()):
            if v not in exp:
                exp[v] = exp[u] + 1
                q.append(v)
    assert got == exp, (edges, seeds, k, directed)
