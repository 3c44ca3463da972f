"""Graph statistics: Python brute-force oracles on the sf0.001 fixture.

The DuckDB oracle (naive 3-way join) runs via test_oracle_parity; this
file checks the compact-forward implementation against an INDEPENDENT
pure-Python count, and the structural invariants of the synthetic graph.
"""

from __future__ import annotations

from itertools import combinations

from tests.conftest import SF_TEST
from uw_hadoop_aglorithms_spark.operators import graphstats


def _edge_set(spark):
    nv = graphstats._n_vertices(spark, SF_TEST)
    rows = graphstats.interaction_edges(spark, SF_TEST, nv).collect()
    return nv, {(r.u, r.v) for r in rows}


def test_edges_canonical_and_in_range(spark):
    nv, edges = _edge_set(spark)
    assert edges, "synthetic graph must be non-empty"
    for u, v in edges:
        assert 0 <= u < v < nv


def test_triangle_count_matches_python_bruteforce(spark):
    _, edges = _edge_set(spark)
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(
        1
        for u, v in edges
        for w in adj[u] & adj[v]
        if w > v  # each triangle once: u < v < w by canonical edges
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())

    row = graphstats.triangle_count(spark, SF_TEST).collect()[0]
    assert row.n_vertices == len(adj)
    assert row.n_edges == len(edges)
    assert row.n_wedges == wedges
    assert row.n_triangles == tri


def test_degree_distribution_sums_to_vertices_and_edges(spark):
    _, edges = _edge_set(spark)
    rows = graphstats.degree_distribution(spark, SF_TEST).collect()
    assert sum(r.n_vertices for r in rows) == len(
        {x for e in edges for x in e}
    )
    # handshake lemma: sum(degree * count) == 2|E|
    assert sum(r.degree * r.n_vertices for r in rows) == 2 * len(edges)
