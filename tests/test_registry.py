"""Registry contract guards (driver interface, __spark_entry__.py).

Cheap but broad: every queries() key must ANALYZE (schema resolution,
no job execution) and, when an oracle exists, its column names must
match the oracle's exactly — the driver hashes values under sorted
column names, so alias drift is a silent correctness failure. DuckDB
runs at sf0.001 (instant); Spark never executes a job here.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_TEST

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_TEST}/{t}.parquet')"
        )
    return con


#: Types the driver's pandas canonicalizer cannot sort/hash (it factorizes
#: cell values): any nested or binary cell breaks the CORRECTNESS harness,
#: so registered outputs must be scalar-only (CORRECTNESS_r01 media_features
#: failed exactly this way with an array<long> column).
_NON_CANONICALIZABLE = ("array<", "map<", "struct<", "binary")


def test_every_query_analyzes_and_matches_oracle_columns(spark, oracle_con):
    qmap, omap = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(omap) <= set(qmap), "oracle keys without a query"
    problems = []
    for name, fn in sorted(qmap.items()):
        try:
            df = fn(spark, SF_TEST)  # analysis only
            cols = df.columns
        except Exception as ex:  # noqa: BLE001
            problems.append(f"{name}: analysis failed: {ex}")
            continue
        for col, kind in df.dtypes:
            if any(kind.startswith(bad) or bad in kind for bad in _NON_CANONICALIZABLE):
                problems.append(
                    f"{name}: column {col} has non-scalar type {kind} "
                    "(driver canonicalizer cannot hash it)"
                )
        if name in omap:
            dcols = [
                d[0] for d in oracle_con.execute(omap[name]).description
            ]
            if sorted(cols) != sorted(dcols):
                problems.append(f"{name}: spark={sorted(cols)} oracle={sorted(dcols)}")
    assert not problems, "\n".join(problems)


def test_rows_only_queries_have_python_oracle_tests(spark):
    """Every registered key must have a DuckDB oracle: the iterative /
    order-sensitive families (PageRank, k-means, serial SGD) are handled
    by generated replay oracles under per-step rounding contracts."""
    qmap, omap = entry_mod.queries(), entry_mod.oracle_sql()
    rows_only = set(qmap) - set(omap)
    assert rows_only == set(), f"unexpected rows-only keys: {rows_only}"


def test_entry_is_registered_query_shape(spark):
    df = entry_mod.entry(spark)
    assert df.columns, "entry() must return an analyzable DataFrame"


def test_doc_profile_stitch_is_in_plan():
    """Pin the round-5 fix: doc_profile must assemble its five members
    with DataFrame joins, never by collecting corpus-sized member
    results to the driver (the round-4 form dict-stitched five
    O(|documents|) collects driver-side — the only registered plan
    whose driver footprint grew with the corpus)."""
    import inspect

    from uw_hadoop_aglorithms_spark.operators import suites

    src = inspect.getsource(suites.doc_profile)
    assert ".collect()" not in src, (
        "doc_profile collects member rows on the driver; stitch must be "
        "in-plan (doc_id joins)"
    )
    assert ".join(" in src
