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
