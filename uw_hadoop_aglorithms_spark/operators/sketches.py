"""Bounded-state sketch aggregates: count-min heavy hitters
(beyond-reference capability; the approximate-aggregate family next to
relational.approx_distinct_users and textstats.approx_length_percentiles).

The reference's only corpus-level statistic is an exact counter side
channel (reference MapReduce/PMI/PairsPMI.java:279); nothing approximate
exists there. A count-min sketch is the canonical fixed-memory frequency
estimator for 100 TB streams: D×W integer counters regardless of corpus
or vocabulary size, mergeable across partitions by addition, point
estimate = min over rows, one-sided error (never underestimates).

Unlike HLL (approx_distinct_users, rows-only: Spark's sketch is opaque),
this CMS is built from the engine-neutral universal hash family
(functions/hashing.py), so DuckDB reproduces the EXACT sketch — estimates
and all — and the driver value-hashes the result end to end.

Plan shape (scale design): exact token counts first (one shuffle over the
token stream with map-side combine — the same shape as word_count), then
the sketch is a |vocab|×D → D×W aggregation: tiny by construction. The
heavy-hitter probe broadcasts the ≤TOPN query rows and the ≤D×W sketch.
At 100 TB the corpus-side work is identical to word_count; everything
downstream is constant-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.functions.hashing import (
    polyhash,
    polyhash_sql,
    uhash,
    uhash_sql,
)
from uw_hadoop_aglorithms_spark.functions.text import TOKENS_SQL, tokens
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

#: D hash rows × W buckets. W is deliberately SMALL relative to the
#: fixture vocabulary (~31 distinct tokens) so bucket collisions occur
#: and the one-sided overestimate is actually exercised; production
#: sizing is W = ceil(e/ε), D = ceil(ln 1/δ).
CMS_DEPTH = 3
CMS_WIDTH = 16
CMS_SEED = 501

#: Heavy hitters reported: top-N by exact count.
TOPN = 30


def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N tokens with exact and count-min-estimated frequencies.

    Output: (token, exact_count, cms_count), cms_count >= exact_count
    always (one-sided CMS guarantee, property-tested).
    """
    docs = Catalog(spark, sf_dir).documents
    tc = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("exact_count"))
        .withColumn("ph", polyhash("token"))
        .cache()
    )
    # sketch: vocab×D rows → D×W counters (addition-merged: the partial
    # aggregation IS the sketch merge, which is why CMS distributes)
    probes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (uhash(F.col("ph"), CMS_SEED + d) % CMS_WIDTH).alias("bucket"),
            )
            for d in range(CMS_DEPTH)
        ]
    )
    hashed = tc.select("token", "exact_count", F.explode(probes).alias("p")).select(
        "token", "exact_count", F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")
    )
    sketch = hashed.groupBy("d", "bucket").agg(F.sum("exact_count").alias("c"))

    top = (
        tc.orderBy(F.col("exact_count").desc(), "token")
        .limit(TOPN)
        .select("token", "exact_count")
    )
    est = (
        hashed.join(F.broadcast(top.select("token")), "token")
        .join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("token")
        .agg(F.min("c").alias("cms_count"))
    )
    return (
        top.join(est, "token")
        .select("token", "exact_count", "cms_count")
        .orderBy(F.col("exact_count").desc(), "token")
    )


def _cms_oracle() -> str:
    """DuckDB oracle rebuilding the identical sketch (generated per-d
    fragments — uhash seeds are literals)."""
    probe_union = " UNION ALL ".join(
        f"SELECT token, exact_count, {d} AS d, "
        f"{uhash_sql('ph', CMS_SEED + d)} % {CMS_WIDTH} AS bucket FROM tc"
        for d in range(CMS_DEPTH)
    )
    return f"""
        WITH raw AS (
            SELECT unnest({TOKENS_SQL}) AS token FROM documents
        ),
        tc0 AS (
            SELECT token, count(*) AS exact_count FROM raw GROUP BY token
        ),
        tc AS (
            SELECT token, exact_count, {polyhash_sql('token')} AS ph FROM tc0
        ),
        hashed AS ({probe_union}),
        sketch AS (
            SELECT d, bucket, CAST(sum(exact_count) AS BIGINT) AS c
            FROM hashed GROUP BY d, bucket
        ),
        top AS (
            SELECT token, exact_count FROM tc
            ORDER BY exact_count DESC, token LIMIT {TOPN}
        )
        SELECT h.token, t.exact_count, min(s.c) AS cms_count
        FROM hashed h
        JOIN top t ON t.token = h.token
        JOIN sketch s ON s.d = h.d AND s.bucket = h.bucket
        GROUP BY h.token, t.exact_count
        ORDER BY t.exact_count DESC, h.token
    """


SKETCH_ORACLES: dict[str, str] = {
    "cms_token_counts": _cms_oracle(),
}
