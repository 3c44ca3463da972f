"""Streaming: batch/stream equivalence (SURVEY.md §2.10 test strategy) and
the geo predicate unit fixture (FIXTURES.md)."""

from __future__ import annotations

import tempfile
from collections import defaultdict

import pytest

from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.functions.geo import GOLDMAN, region_tag
from uw_hadoop_aglorithms_spark.streaming import runner, trending, windows
from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def replay(spark):
    d = tempfile.mkdtemp(prefix="replay_")
    runner.prepare_replay_dir(spark, SF_TEST, f"{d}/events")
    return d


def test_stream_event_count_equals_batch(spark, replay):
    batch = {
        (r.window_start, r.cnt)
        for r in windows.event_count(spark, SF_TEST).collect()
    }
    stream = {
        (r.window_start, r.cnt)
        for r in runner.stream_event_count(
            spark, f"{replay}/events", f"{replay}/cp_ec"
        ).collect()
    }
    assert stream == batch


def test_stream_region_event_count_equals_batch(spark, replay):
    batch = {
        (r.window_start, r.event_type, r.cnt)
        for r in windows.region_event_count(spark, SF_TEST).collect()
    }
    stream = {
        (r.window_start, r.event_type, r.cnt)
        for r in runner.stream_region_event_count(
            spark, f"{replay}/events", f"{replay}/cp_rec"
        ).collect()
    }
    assert stream == batch


def test_stream_trending_equals_batch_except_open_windows(spark, replay):
    batch_rows = windows.trending_arrivals(spark, SF_TEST).collect()
    last_window = {}
    for r in batch_rows:
        if r.event_type not in last_window or r.window_start > last_window[r.event_type]:
            last_window[r.event_type] = r.window_start
    expected = {
        (r.event_type, r.window_start, r.cnt, r.prev, r.alert)
        for r in batch_rows
        if r.window_start != last_window[r.event_type]
    }
    got = {
        (r.event_type, r.window_start, r.cnt, r.prev, r.alert)
        for r in trending.stream_trending_arrivals(
            spark, f"{replay}/events", f"{replay}/cp_trend"
        ).collect()
    }
    assert got == expected
    assert got, "stream should emit closed windows"


def test_geo_region_tag(spark):
    gx = (GOLDMAN[1] + GOLDMAN[2]) / 2
    gy = (GOLDMAN[3] + GOLDMAN[4]) / 2
    df = spark.createDataFrame(
        [(gx, gy), (-74.0110, 40.7209), (0.0, 0.0)], "lon double, lat double"
    )
    got = [r.region for r in df.select(region_tag(F.col("lon"), F.col("lat")).alias("region")).collect()]
    assert got == ["goldman", "citigroup", None]
