"""Schema contract against the REAL testdata directories.

Round-2 regression class: `Catalog._load_events` assumed the parquet `ts`
encoding (nanosecond longs) and broke every events consumer when the
testdata shipped TIMESTAMP(MICROS) instead. These tests load each table
from every scale-factor dir the harness uses, so a testdata dtype change
fails pytest before the driver ever runs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_wall_time_every_sf(spark, sf_dir):
    """events.ts must come out of the catalog as the NAIVE wall time
    (TIMESTAMP_NTZ — session-timezone-independent by construction,
    round 7), regardless of the parquet physical encoding (nanos-long
    or micros). Streaming converts to TimestampType at the replay
    boundary (runner._events_stream_schema)."""
    ev = Catalog(spark, sf_dir).events
    assert isinstance(ev.schema["ts"].dataType, T.TimestampNTZType), (
        f"{sf_dir}: events.ts loaded as {ev.schema['ts'].dataType}"
    )
    # and it must actually evaluate (analysis errors surface on collect)
    row = ev.select("ts").limit(1).collect()
    assert row and row[0][0] is not None


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_declared_schemas_match_disk(spark, sf_dir):
    """Every catalog table at every sf dir matches the declared schema."""
    problems = Catalog(spark, sf_dir).validate_schemas()
    assert problems == []
