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


# --------------------------------------------------------------------------
# copy-on-write MERGE (upsert)
# --------------------------------------------------------------------------


def _merge_fixture(spark):
    """(lake path, base df, updates df): a fresh lake plus a
    deterministic update batch — same-day content patches (%97, first
    10 days only so some partitions stay out of the blast radius) and
    future-day inserts (%131, shifted key + ts)."""
    ev = Catalog(spark, SF_TEST).events.select(
        "event_id", "ts", "event_type", "value"
    )
    d = tempfile.mkdtemp(prefix="lake_merge_")
    lake.write_date_partitioned(ev, f"{d}/events")
    upd = (
        ev.filter((F.col("event_id") % 97 == 0) & (F.dayofmonth("ts") <= 10))
        .withColumn("event_type", F.lit("patched"))
        .withColumn("value", F.col("value") + 1000.0)
    )
    ins = (
        ev.filter(F.col("event_id") % 131 == 0)
        .withColumn("event_id", F.col("event_id") + F.lit(10_000_000_000))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 90 DAYS"))
        .withColumn("event_type", F.lit("backfill"))
    )
    return d, ev, upd.unionByName(ins)


def _symdiff(a, b) -> int:
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_merge_upsert_semantics_and_idempotence(spark):
    import shutil

    d, ev, updates = _merge_fixture(spark)
    try:
        lake.merge_into_lake(spark, f"{d}/events", updates)
        got = spark.read.parquet(f"{d}/events").drop("dt")
        keys = updates.select("event_id")
        expect = ev.join(keys, "event_id", "left_anti").unionByName(updates)
        assert _symdiff(got, expect) == 0
        # merging the same batch again must be a no-op on content
        lake.merge_into_lake(spark, f"{d}/events", updates)
        got2 = spark.read.parquet(f"{d}/events").drop("dt")
        assert _symdiff(got2, expect) == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_merge_rewrites_only_affected_partitions(spark):
    import shutil
    import time

    d, _ev, updates = _merge_fixture(spark)
    try:
        before = lake.snapshot_files(f"{d}/events")
        time.sleep(0.05)  # mtime_ns resolution guard
        days = lake.merge_into_lake(spark, f"{d}/events", updates)
        after = lake.snapshot_files(f"{d}/events")
        changed = {
            rel.split("/")[0]
            for rel in set(before) | set(after)
            if before.get(rel) != after.get(rel)
        }
        assert changed, "merge must rewrite the affected partitions"
        assert changed <= {f"dt={x}" for x in days}, (
            f"rewrote partitions outside the affected set: "
            f"{changed - {f'dt={x}' for x in days}}"
        )
        untouched = [r for r in before if r.split("/")[0] not in changed]
        assert untouched, "fixture must leave some partitions untouched"
        assert all(before[r] == after[r] for r in untouched)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_delete_erases_keys_and_only_touches_their_days(spark):
    import shutil
    import time

    d, ev, _updates = _merge_fixture(spark)
    try:
        before = lake.snapshot_files(f"{d}/events")
        time.sleep(0.05)
        kill = ev.filter(
            (F.col("event_id") % 89 == 0) & (F.dayofmonth("ts") <= 10)
        ).select("event_id")
        days = lake.delete_from_lake(spark, f"{d}/events", kill)
        got = spark.read.parquet(f"{d}/events").drop("dt")
        expect = ev.join(kill, "event_id", "left_anti")
        assert _symdiff(got, expect) == 0
        # physical erasure: no file still holds a deleted key
        assert (
            spark.read.parquet(f"{d}/events")
            .join(kill, "event_id", "left_semi")
            .count()
            == 0
        )
        after = lake.snapshot_files(f"{d}/events")
        changed = {
            rel.split("/")[0]
            for rel in set(before) | set(after)
            if before.get(rel) != after.get(rel)
        }
        assert changed <= {f"dt={x}" for x in days}
        untouched = [r for r in before if r.split("/")[0] not in changed]
        assert untouched and all(before[r] == after[r] for r in untouched)
        # absent keys: a no-op that reports no affected days
        assert lake.delete_from_lake(
            spark, f"{d}/events",
            spark.range(1).select((F.col("id") + 77_000_000_000).alias("event_id")),
        ) == []
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_delete_vacates_fully_deleted_partition(spark):
    import os
    import shutil

    d, ev, _updates = _merge_fixture(spark)
    try:
        day = ev.select(F.date_format("ts", "yyyy-MM-dd").alias("d")).agg(
            F.min("d").alias("d")
        ).first().d
        whole_day = ev.filter(
            F.date_format("ts", "yyyy-MM-dd") == day
        ).select("event_id")
        n_day = whole_day.count()
        assert n_day > 0
        days = lake.delete_from_lake(spark, f"{d}/events", whole_day)
        assert day in days
        assert not os.path.exists(f"{d}/events/dt={day}"), (
            "fully-vacated partition directory must be removed"
        )
        got = spark.read.parquet(f"{d}/events").drop("dt")
        assert got.count() == ev.count() - n_day
        assert _symdiff(got, ev.join(whole_day, "event_id", "left_anti")) == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_merge_widens_schema_and_rejects_column_drops(spark):
    import shutil

    d, ev, updates = _merge_fixture(spark)
    try:
        wide = updates.withColumn("crawl_src", F.lit("recrawl-2024"))
        days = lake.merge_into_lake(spark, f"{d}/events", wide)
        got = lake.read_lake(spark, f"{d}/events")
        assert "crawl_src" in got.columns
        # updated rows carry the new column; pre-existing rows are null
        tagged = got.filter(F.col("crawl_src").isNotNull())
        assert tagged.count() == wide.count()
        # ...and ONLY the updated rows: no null-column row has an updated key
        keys = wide.select("event_id")
        assert (
            got.filter(F.col("crawl_src").isNull())
            .join(keys, "event_id", "left_semi")
            .count()
            == 0
        )
        # untouched partitions are readable and still lack the column
        other_day = sorted(
            {r.dt for r in got.select("dt").distinct().collect()}
            - {x for x in days}
        )
        assert other_day, "widening merge must leave narrow partitions"
        # dropping a base column must raise, not null data out
        with pytest.raises(ValueError, match="missing base columns"):
            lake.merge_into_lake(
                spark, f"{d}/events", updates.drop("value")
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_day_reduces_files_and_preserves_content(spark):
    import shutil
    import time

    ev = Catalog(spark, SF_TEST).events.select(
        "event_id", "ts", "event_type", "value"
    )
    d = tempfile.mkdtemp(prefix="lake_compact_")
    try:
        # 8 shuffle-spread tasks → up to 8 files per day directory
        lake.write_date_partitioned(ev.repartition(8), f"{d}/events")
        day = ev.select(F.date_format("ts", "yyyy-MM-dd").alias("dd")).agg(
            F.min("dd").alias("dd")
        ).first().dd
        before = lake.snapshot_files(f"{d}/events")
        n_before = sum(1 for r in before if r.startswith(f"dt={day}/"))
        assert n_before > 1, "fixture must start fragmented"
        time.sleep(0.05)
        n_after = lake.compact_day(spark, f"{d}/events", day)
        assert n_after == 1
        after = lake.snapshot_files(f"{d}/events")
        changed = {
            rel.split("/")[0]
            for rel in set(before) | set(after)
            if before.get(rel) != after.get(rel)
        }
        assert changed == {f"dt={day}"}, f"compaction leaked into {changed}"
        got = lake.read_day(spark, f"{d}/events", day)
        want = ev.filter(F.date_format("ts", "yyyy-MM-dd") == day)
        assert _symdiff(got, want) == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_merge_rejects_day_moving_updates(spark):
    import shutil

    d, ev, _updates = _merge_fixture(spark)
    try:
        before = lake.snapshot_files(f"{d}/events")
        bad = ev.filter(F.col("event_id") % 997 == 0).withColumn(
            "ts", F.col("ts") + F.expr("INTERVAL 400 DAYS")
        )
        with pytest.raises(ValueError, match="moves keys"):
            lake.merge_into_lake(spark, f"{d}/events", bad)
        # the rejected merge must not have touched the lake
        assert lake.snapshot_files(f"{d}/events") == before
    finally:
        shutil.rmtree(d, ignore_errors=True)
