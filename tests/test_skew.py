"""Salted-join equivalence + plan summary sanity (plans/skew.py)."""

from __future__ import annotations

from uw_hadoop_aglorithms_spark.plans import skew
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog
from tests.conftest import SF_TEST


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    cat = Catalog(spark, SF_TEST)
    big = cat.lineitem.select("l_orderkey", "l_quantity").withColumnRenamed(
        "l_orderkey", "k"
    )
    small = cat.orders.select("o_orderkey", "o_orderpriority").withColumnRenamed(
        "o_orderkey", "k"
    )
    plain = big.join(small, "k")
    salted = skew.salted_join(big, small, "k")
    assert _rows(salted) == _rows(plain)
    assert salted.columns == plain.columns


def test_plan_summary_reports_scan_and_joins(spark):
    from uw_hadoop_aglorithms_spark.operators import relational

    s = skew.plan_summary(relational.q3(spark, SF_TEST), execute=True)
    assert s["file_scans"] >= 3
    assert s["broadcast_hash_joins"] >= 1
    assert s["wholestage_codegen_spans"] >= 1
    assert any("l_shipdate" in p for p in s["pushed_filters"])


def test_aqe_skew_join_split_fires(spark):
    """session.py enables AQE skew-join splitting; this pins that the
    rewrite actually FIRES (a conf that silently stopped applying would
    otherwise degrade 100 TB skew handling with no test signal). With
    the skew thresholds lowered to toy scale, a join whose shuffle has
    one hot key must show skew=true sort-merge-join markers in the
    FINAL adaptive plan, and results must equal the plain join."""
    from pyspark.sql import functions as F

    skew_confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # splitting is skipped when it would add an extra shuffle for a
        # downstream requirement; forcing removes the bail-out
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in skew_confs}
    for k, v in skew_confs.items():
        spark.conf.set(k, v)
    try:
        # one key carries 50k wide rows, 200 keys carry one row each.
        # NOTE: the certificate is on the BARE join — an aggregation on
        # the join key directly above it suppresses the split (the
        # rewrite would break the agg's required hashpartitioning),
        # which is itself worth knowing: a skewed join feeding a
        # same-key groupBy must be salted (plans/skew.salted_join),
        # not left to AQE.
        big = spark.range(0, 50_200).select(
            F.when(F.col("id") < 50_000, F.lit(7))
            .otherwise(F.col("id") % 200 + 100)
            .alias("k"),
            F.concat(F.lit("x" * 200), F.col("id")).alias("payload"),
        )
        dim = spark.range(0, 400).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = big.join(dim, "k")
        assert len(joined.collect()) == 50_200
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
        assert "skewed" in final  # AQEShuffleRead … skewed on the big side
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
