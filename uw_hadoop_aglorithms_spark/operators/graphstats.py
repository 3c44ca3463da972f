"""Graph statistics: degree distribution + triangle counting
(beyond-reference capability; complements the PPR family of
operators/graph.py, SURVEY.md §2.8).

The reference's only graph is the PageRank adjacency list (reference
MapReduce/PageRank/BuildPersonalizedPageRankRecords.java:85-126); the
testdata star-schema graph (customer→supplier) is bipartite, so triangle
analytics over it are degenerate by construction, and its co-supply
projection saturates into a complete graph at sf0.1. Instead the graph
here is SYNTHETIC-DETERMINISTIC, the same pattern as the geo query's
lon/lat and pii_redact's injected spans: each `events` row contributes
one undirected edge whose endpoints derive from event_id via the
engine-neutral universal hash (functions/hashing.py), over a vertex
space sized to the table (|V| = |events| / 10 → expected degree ~20 at
every scale factor). Both engines rebuild the identical edge list, so
every statistic is value-hash oracle-checked.

Scale design (100 TB target):
- degree_distribution is two groupBys (edge endpoints → degrees →
  histogram); shuffle volume is |E| longs then |V| pairs — linear.
- triangle_count uses the DEGREE-ORDERED orientation (compact-forward):
  each undirected edge is directed from its lower-(degree, id) endpoint
  to the higher, so every wedge is enumerated exactly once at its
  lowest-ranked vertex and the per-vertex out-degree is bounded by
  O(sqrt(|E|)) on any graph. The wedge self-join therefore generates
  Σ outdeg² = O(|E|^1.5) candidate rows worst-case — the published
  bound for this algorithm — instead of the Σ deg² of a naive
  node-iterator, which a few hot vertices (the 100 TB skew case) would
  blow up quadratically. Closing wedges is one equi-join against the
  oriented edge set. The DuckDB oracle deliberately stays the NAIVE
  three-way join (a<b<c) — small-scale ground truth, different plan,
  same count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.functions.hashing import bucket, bucket_sql
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

#: Universal-hash family members for the two synthetic endpoints.
SRC_SEED, DST_SEED = 401, 402

#: |V| = |events| / VERTEX_DIVISOR → expected degree ~2·VERTEX_DIVISOR,
#: constant across scale factors (the graph stays sparse as it grows).
VERTEX_DIVISOR = 10


def _n_vertices(spark: SparkSession, sf_dir: str) -> int:
    """Vertex-space size — a metadata-scale scalar (like build_graph's
    max-key probe, operators/graph.py), not a data collect."""
    n = Catalog(spark, sf_dir).events.count()
    return max(n // VERTEX_DIVISOR, VERTEX_DIVISOR)


def interaction_edges(spark: SparkSession, sf_dir: str, nv: int) -> DataFrame:
    """Canonical undirected edge list (u < v, distinct, no self-loops).

    Endpoints are pure column arithmetic over event_id — map-side; the
    only shuffle is the distinct on the (u, v) key.
    """
    ev = Catalog(spark, sf_dir).events
    src = bucket("event_id", SRC_SEED, nv)
    dst = bucket("event_id", DST_SEED, nv)
    return (
        ev.select(src.alias("s"), dst.alias("d"))
        .where(F.col("s") != F.col("d"))
        .select(
            F.least("s", "d").alias("u"),
            F.greatest("s", "d").alias("v"),
        )
        .distinct()
    )


def _edges_sql(nv_sql: str) -> str:
    """DuckDB CTE body building the identical canonical edge list."""
    s = bucket_sql("event_id", SRC_SEED, nv_sql)
    d = bucket_sql("event_id", DST_SEED, nv_sql)
    return f"""
        SELECT DISTINCT least({s}, {d}) AS u, greatest({s}, {d}) AS v
        FROM events
        WHERE {s} <> {d}
    """


def _degrees(edges: DataFrame) -> DataFrame:
    """(id, deg) for every vertex incident to ≥1 edge."""
    return (
        edges.select(F.col("u").alias("id"))
        .unionAll(edges.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )


def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the interaction graph: (degree, n_vertices).

    Two aggregations, both with map-side partials; output is |distinct
    degrees| rows (~O(max degree)) — tiny at any corpus size.
    """
    nv = _n_vertices(spark, sf_dir)
    edges = interaction_edges(spark, sf_dir, nv)
    return (
        _degrees(edges)
        .groupBy("deg")
        .agg(F.count("*").alias("n_vertices"))
        .select(F.col("deg").alias("degree"), "n_vertices")
        .orderBy("degree")
    )


def _rank(deg: Column, id_: Column) -> Column:
    """Total order (degree, id) as a comparable struct — the orientation
    key of the compact-forward algorithm."""
    return F.struct(deg.alias("r_deg"), id_.alias("r_id"))


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row graph summary: vertices, edges, wedges, triangles, and
    the global clustering coefficient (3·triangles / wedges).

    Plan: orient edges low→high rank, self-join on the low endpoint to
    enumerate each wedge once (out-degree bounded by O(sqrt|E|) under
    this orientation), close wedges with one equi-join back against the
    oriented edge set. Three shuffles total, every count integer-exact.
    """
    nv = _n_vertices(spark, sf_dir)
    edges = interaction_edges(spark, sf_dir, nv).cache()
    degs = _degrees(edges).cache()

    du = degs.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = degs.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    ranked = edges.join(du, "u").join(dv, "v")
    lo_first = _rank(F.col("du"), F.col("u")) < _rank(F.col("dv"), F.col("v"))
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).cache()

    w1 = oriented.select("a", F.col("b").alias("x"), F.col("db").alias("dx"))
    w2 = oriented.select("a", F.col("b").alias("y"), F.col("db").alias("dy"))
    wedges = w1.join(w2, "a").where(
        _rank(F.col("dx"), F.col("x")) < _rank(F.col("dy"), F.col("y"))
    )
    closing = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count("*").alias("n_triangles")
    )

    # three 1-row aggregates crossJoined — everything stays in-plan (no
    # driver round-trip, unlike the reference's counter side-channels)
    summary = (
        degs.agg(
            F.count("*").alias("n_vertices"),
            (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
            .cast("long")
            .alias("n_wedges"),
        )
        .crossJoin(edges.agg(F.count("*").alias("n_edges")))
        .crossJoin(tri)
    )
    return summary.select(
        "n_vertices",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 9).alias(
            "clustering"
        ),
    )


_NV_SQL = f"greatest((SELECT count(*) FROM events) // {VERTEX_DIVISOR}, {VERTEX_DIVISOR})"

GRAPHSTATS_ORACLES: dict[str, str] = {
    "degree_distribution": f"""
        WITH e AS ({_edges_sql(_NV_SQL)}),
        d AS (
            SELECT id, count(*) AS deg FROM (
                SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e
            ) GROUP BY id
        )
        SELECT deg AS degree, count(*) AS n_vertices
        FROM d GROUP BY deg ORDER BY degree
    """,
    # naive three-way join (a<b<c): the small-scale ground truth the
    # degree-ordered Spark plan is verified against
    "triangle_count": f"""
        WITH e AS ({_edges_sql(_NV_SQL)}),
        d AS (
            SELECT id, count(*) AS deg FROM (
                SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e
            ) GROUP BY id
        ),
        tri AS (
            SELECT count(*) AS n_triangles
            FROM e e1
            JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT (SELECT count(*) FROM d) AS n_vertices,
               (SELECT count(*) FROM e) AS n_edges,
               (SELECT CAST(sum(deg * (deg - 1)) // 2 AS BIGINT) FROM d)
                 AS n_wedges,
               n_triangles,
               round(3.0 * n_triangles /
                     (SELECT sum(deg * (deg - 1)) / 2 FROM d), 9) AS clustering
        FROM tri
    """,
}


# --------------------------------------------------------------------------
# Connected components: two-phase star contraction (Kiveris et al.,
# "Connected Components in MapReduce and Beyond", SoCC'14). The
# deep-component alternative to dedup.dedup_clusters' min-label
# propagation: label propagation needs O(diameter) rounds (a 1000-node
# chain = 1000 rounds), star contraction converges in O(log n) rounds on
# any topology — the difference between infeasible and routine when a
# 100 TB near-dup graph contains long chains. Near-dup components are
# typically shallow, which is why dedup_clusters keeps the simpler
# propagation (VERDICT r3 plan audit); this is the library escape hatch
# for when they are not.
# --------------------------------------------------------------------------

CC_MAX_ROUNDS = 25


def _large_star(sym: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's minimum
    neighborhood label min({u} ∪ N(u))."""
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    m = F.least(F.col("u"), F.col("mv"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), m.alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Canonicalize edges to point downward, then connect every
    smaller-or-equal neighbor of u (and u itself) to the minimum."""
    canon = edges.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("mv"))
    to_min = canon.join(mins, "u")
    links = to_min.select(F.col("v").alias("a"), F.col("mv").alias("b")).union(
        to_min.select(F.col("u").alias("a"), F.col("mv").alias("b"))
    )
    return links.where(F.col("a") != F.col("b")).distinct()


def connected_components(edges: DataFrame, max_rounds: int = CC_MAX_ROUNDS) -> DataFrame:
    """(id, component) for every vertex of the undirected edge list
    `edges` (columns a, b) — component = the member with minimum id.

    Each round is large-star then small-star; convergence is detected by
    an order-insensitive checksum of the edge set (two scalar aggregates
    — no edge collect). State between rounds is materialized with
    localCheckpoint exactly like the PageRank loop (graph._materialize
    rationale: the edge set is consumed by both phases and the
    checksum). Isolated vertices are their own components and are not
    reported (they have no edges to appear in).
    """
    cur = (
        edges.select(F.col("a").cast("long"), F.col("b").cast("long"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def checksum(e: DataFrame) -> tuple:
        # full 64-bit hash summed exactly as decimal(38,0): a mod-1e6
        # residue sum (earlier form) leaves ~2^-20 odds that two
        # DIFFERENT consecutive edge sets collide and terminate the
        # contraction early with wrong components; the full-width sum
        # shrinks that to ~2^-64. decimal keeps the sum exact under
        # ANSI mode (no int64 overflow) up to ~10^19 edges.
        r = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (r.n, r.h)

    prev = None
    for _ in range(max_rounds):
        sym = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        cur = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        sig = checksum(cur)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # converged state is a star forest: every edge points leaf → root
    roots = cur.select(F.col("b").alias("id")).distinct().select(
        "id", F.col("id").alias("component")
    )
    leaves = cur.select(F.col("a").alias("id"), F.col("b").alias("component"))
    return leaves.union(roots).distinct()
