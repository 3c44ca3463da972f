"""Shared pytest fixtures: one SparkSession for the whole test run."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF_TEST = "/root/testdata/sf0.001"  # unit tests: smallest, fastest
SF_ORACLE = "/root/testdata/sf0.001"  # oracle parity in tests (driver uses sf0.01)


@pytest.fixture(scope="session")
def spark():
    from uw_hadoop_aglorithms_spark.session import get_spark

    s = get_spark("uw-hadoop-aglorithms-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()
