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
