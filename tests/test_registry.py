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


#: Registered wrappers allowed to `.collect()` driver-side, with the
#: reason their collect is BOUNDED (does not grow with the corpus).
#: Anything NOT listed here must stitch in-plan (unionAll / joins) —
#: doc_profile (r5) and spam (r6) both regressed into corpus-sized
#: driver stitches before this guard generalized.
_BOUNDED_COLLECT_ALLOWLIST = {
    "window_counts": "window counts bounded by the event-time range, not input volume",
    "stream_batch_equiv": "memory-sink micro-batch results; state bounded per window/key/digest horizon",
    "neardup_pairs": "near-dup pair lists (sparse by construction; quadratic members guarded by BRUTE_MAX_ROWS)",
    "ann_topk": "top-k neighbor lists over an ANN_MAX_QUERIES-capped query side",
    "layout_suite": "per-group aggregate rows + in-plan certificate booleans (group cardinality bounded)",
}

_COLLECT_MARKERS = (".collect()", ".toPandas()", ".collectAsList", ".toLocalIterator")


def test_registered_wrappers_collect_only_bounded_state():
    """Generalized no-collect guard (VERDICT r5 #1): scan EVERY
    registered wrapper's source for driver-side materialization; a
    wrapper that collects must be explicitly allowlisted with a
    boundedness argument. doc_profile and spam are pinned in-plan —
    they are the two wrappers that previously held per-document Python
    copies of their members on the driver."""
    import inspect

    import __spark_entry__ as entry_mod

    problems = []
    for name, fn in sorted(entry_mod.queries().items()):
        # unwrap defensively in case a registered callable is ever
        # functools-wrapped again (the round-7 NTZ migration removed the
        # last wrapper, commit 31935fc); today this is a no-op
        src = inspect.getsource(inspect.unwrap(fn))
        hits = [m for m in _COLLECT_MARKERS if m in src]
        if hits and name not in _BOUNDED_COLLECT_ALLOWLIST:
            problems.append(
                f"{name}: wrapper source contains {hits} but is not in the "
                "bounded-collect allowlist; stitch in-plan (unionAll/join) "
                "or add it with a boundedness argument"
            )
    assert not problems, "\n".join(problems)
    # the two cured wrappers must never silently re-enter the allowlist
    for pinned in ("doc_profile", "spam"):
        assert pinned not in _BOUNDED_COLLECT_ALLOWLIST, (
            f"{pinned} was cured of its driver-side stitch; it must stay in-plan"
        )
