"""Graph statistics: Python brute-force oracles on the sf0.001 fixture.

The DuckDB oracle (naive 3-way join) runs via test_oracle_parity; this
file checks the compact-forward implementation against an INDEPENDENT
pure-Python count, and the structural invariants of the synthetic graph.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

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


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark):
    """Star contraction vs a Python union-find over the same synthetic
    interaction graph."""
    from uw_hadoop_aglorithms_spark.operators.graphstats import (
        _n_vertices,
        connected_components,
        interaction_edges,
    )

    nv = _n_vertices(spark, SF_TEST)
    e = interaction_edges(spark, SF_TEST, nv).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    got = {
        r.id: r.component for r in connected_components(e).collect()
    }
    exp = _union_find([(r.a, r.b) for r in e.collect()])
    assert got == exp


def test_connected_components_log_rounds_on_deep_chain(spark):
    """The reason this operator exists: a 1024-node CHAIN (diameter
    1023, the worst case for per-round label propagation) must converge
    in O(log n) star rounds, and produce one component rooted at 0."""
    n = 1024
    chain = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    from uw_hadoop_aglorithms_spark.operators import graphstats

    comp = graphstats.connected_components(chain, max_rounds=15).collect()
    assert len(comp) == n
    assert {r.component for r in comp} == {0}


def test_connected_components_random_graphs_property(spark):
    """Property check over seeded random graphs (hypothesis-style
    explicit corpus: a Spark job per example is too slow for @given's
    default budget): star contraction must agree with union-find on
    graphs spanning sparse forests, dense blobs, and self-loop noise."""
    import random

    from uw_hadoop_aglorithms_spark.operators import graphstats

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 50, 80), (3, 12, 40), (4, 200, 120)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        e = spark.createDataFrame(edges, "a long, b long")
        got = {
            r.id: r.component
            for r in graphstats.connected_components(e).collect()
        }
        exp = _union_find([p for p in edges if p[0] != p[1]])
        assert got == exp, (seed, n_nodes, n_edges)
