"""Date-partitioned lake layout: pruning is a tested property."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.sources import lake
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog
from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def lake_dir(spark):
    d = tempfile.mkdtemp(prefix="lake_")
    lake.write_date_partitioned(Catalog(spark, SF_TEST).events, f"{d}/events")
    return f"{d}/events"


def test_read_day_prunes_partitions(spark, lake_dir):
    ev = Catalog(spark, SF_TEST).events
    day = ev.select(F.date_format("ts", "yyyy-MM-dd").alias("d")).first().d
    df = lake.read_day(spark, lake_dir, day)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "dt" in pf, f"dt filter not pushed to partition pruning: {pf}"
    # correctness: pruned read equals a post-scan filter
    want = ev.filter(F.date_format("ts", "yyyy-MM-dd") == day).count()
    assert df.count() == want


def test_roundtrip_preserves_rows(spark, lake_dir):
    assert (
        spark.read.parquet(lake_dir).count()
        == Catalog(spark, SF_TEST).events.count()
    )
