"""K-means structural invariants (cross-engine value parity runs via
test_oracle_parity against the generated CTE oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_TEST
from uw_hadoop_aglorithms_spark.operators import cluster
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog


def test_kmeans_partitions_all_vectors(spark):
    rows = cluster.kmeans_clusters(spark, SF_TEST).collect()
    n_vec = Catalog(spark, SF_TEST).embeddings.count()
    assert sum(r.n_points for r in rows) == n_vec
    assert 1 <= len(rows) <= cluster.KM_K
    assert all(r.inertia >= 0 for r in rows)
    assert all(r.centroid_norm > 0 for r in rows)


def test_kmeans_assignment_improves_on_init(spark):
    """Total inertia after KM_ITERS rounds must not exceed the inertia of
    the initial codebook (Lloyd's is monotone non-increasing)."""
    vecs = cluster._vectors(spark, SF_TEST)
    init = cluster._init_centroids(spark, SF_TEST)
    init_inertia = (
        vecs.select(cluster._assign(F.col("v"), init)["dist"].alias("d"))
        .agg(F.sum("d"))
        .first()[0]
    )
    final = cluster.kmeans_clusters(spark, SF_TEST).agg(F.sum("inertia")).first()[0]
    assert final <= init_inertia + 1e-6


def test_assign_frame_matches_catalyst(spark):
    """Round-12 pin: the numpy assign kernel (_assign_frame) must emit
    the same (cid, dist) per vector as the Catalyst struct-min fold it
    replaced — including the equal-distance tie to the LOWER cid and
    the bit-exact left-to-right (x−c)² accumulation."""
    from pyspark.sql import functions as F

    vecs = cluster._vectors(spark, SF_TEST)
    cents = cluster._init_centroids(spark, SF_TEST)
    got = {
        r.vec_id: (r.cid, r.dist)
        for r in cluster._assign_frame(vecs, cents).collect()
    }
    ref = {
        r.vec_id: (r.a.cid, r.a.dist)
        for r in vecs.select(
            "vec_id", cluster._assign(F.col("v"), cents).alias("a")
        ).collect()
    }
    assert got == ref
