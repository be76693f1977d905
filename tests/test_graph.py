"""Unit tests for operators/graph.py pagerank: pure-Python replica
equality, rank-mass conservation with dangling nodes, and a known
tiny-graph sanity check."""

from collections import defaultdict

from pyspark.sql import functions as F

from document_parser_private_spark.operators.graph import (
    PAGERANK_DAMPING,
    pagerank,
)


def _py_pagerank(edges, iterations=5, d=PAGERANK_DAMPING):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = defaultdict(int)
    for s, _ in edges:
        out[s] += 1
    pr = {v: 1.0 / n for v in nodes}
    base = (1.0 - d) / n
    for _ in range(iterations):
        dangling = sum(pr[v] for v in nodes if out[v] == 0)
        inflow = defaultdict(float)
        for s, t in edges:
            inflow[t] += pr[s] / out[s]
        pr = {
            v: base + d * (inflow[v] + dangling / n) for v in nodes
        }
    return {v: round(p, 8) for v, p in pr.items()}


def _run(spark, edges, iterations=5):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["pagerank"]
        for r in pagerank(df, iterations=iterations).collect()
    }


def test_pagerank_matches_python_with_dangling(spark):
    # 0..9 ring plus chords; nodes 20, 21 are dangling sinks
    edges = [(i, (i + 1) % 10) for i in range(10)]
    edges += [(i, (i * 3 + 1) % 10) for i in range(10)]
    edges += [(0, 20), (5, 21)]
    got = _run(spark, edges)
    assert got == _py_pagerank(edges)


def test_pagerank_mass_conserved(spark):
    edges = [(i, (i * 7 + 1) % 30) for i in range(25)]
    got = _run(spark, edges, iterations=4)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_authority_ordering(spark):
    # star: everyone links to 0; 0 links to 1. 0 must rank highest.
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    got = _run(spark, edges)
    assert got[0] == max(got.values())
    assert got[1] > got[2]  # 1 receives the hub's whole rank


# ---------------------------------------------------------------- triangles

from document_parser_private_spark.operators.graph import (  # noqa: E402
    triangle_count,
)
from itertools import combinations  # noqa: E402


def _py_triangles(edges):
    """Brute-force reference: canonical undirected simple graph, count
    triangles each node participates in."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return adj, tri


def _run_tri(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r for r in triangle_count(df).collect()}


def test_triangle_count_matches_bruteforce(spark):
    # hub node 0 (degree skew), a clique, a path, dup + reversed +
    # self-loop edges to exercise canonicalization
    edges = [(0, i) for i in range(1, 12)]
    edges += [(a, b) for a, b in combinations([1, 2, 3, 4], 2)]  # K4
    edges += [(12, 13), (13, 14), (14, 12)]          # separate triangle
    edges += [(20, 21), (21, 22)]                    # open path, no tri
    edges += [(2, 1), (0, 5), (7, 7)]                # dup/rev/self-loop
    adj, want = _py_triangles(edges)
    got = _run_tri(spark, edges)
    assert set(got) == set(adj)
    for n in adj:
        assert got[n]["triangles"] == want[n], n
        assert got[n]["degree"] == len(adj[n]), n
        deg = len(adj[n])
        if deg >= 2:
            assert got[n]["clustering"] == round(
                want[n] * 2.0 / (deg * (deg - 1)), 6)
        else:
            assert got[n]["clustering"] is None


def test_triangle_count_total_is_thrice_global(spark):
    # every triangle contributes exactly 3 node participations
    edges = [(i, (i + d) % 40) for i in range(40) for d in (1, 2, 4)]
    _, want = _py_triangles(edges)
    got = _run_tri(spark, edges)
    assert sum(r["triangles"] for r in got.values()) == sum(want.values())
    assert sum(want.values()) % 3 == 0 and sum(want.values()) > 0
