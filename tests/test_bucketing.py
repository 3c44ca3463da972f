"""Bucketed-join plan property: co-located tables join with NO Exchange
(the SCALING.md claim, made checkable)."""

from __future__ import annotations

import pytest

from uw_hadoop_aglorithms_spark.plans import bucketing
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog
from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    cat = Catalog(spark, SF_TEST)
    bucketing.write_bucketed(
        cat.orders.select("o_orderkey", "o_orderpriority"), "b_orders", "o_orderkey"
    )
    bucketing.write_bucketed(
        cat.lineitem.select(
            "l_orderkey", "l_quantity"
        ).withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
    )
    return ("b_orders", "b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # the fixture tables are tiny, so the planner would broadcast and skip
    # the bucketed path entirely; disabling auto-broadcast simulates the
    # fact-fact join shape bucketing exists for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(spark, left, right, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle either side"
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_shuffle_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = sorted(
        tuple(r) for r in bucketing.bucketed_join(spark, left, right, "o_orderkey").collect()
    )
    cat = Catalog(spark, SF_TEST)
    want = sorted(
        tuple(r)
        for r in cat.orders.select("o_orderkey", "o_orderpriority")
        .join(
            cat.lineitem.select("l_orderkey", "l_quantity").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .collect()
    )
    assert got == want
