"""Driver-style oracle parity: Spark result == DuckDB result, per query.

Mimics the verify harness (__spark_entry__.py contract): for every key in
queries() that has an oracle_sql() entry, run both on the same sf dir and
compare row count, column names, and an order-insensitive multiset of
normalized values. This is the repo's continuous local stand-in for
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse FP noise below a relative 1e-9 (queries already round
        # explicitly where summation order matters)
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(
        (tuple(_norm(row[c]) for c in cols) for row in df.collect()),
        key=lambda t: tuple(map(str, t)),
    )


def _duck_rows(duck, sql):
    cur = duck.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        (tuple(_norm(r[i]) for i in order) for r in cur.fetchall()),
        key=lambda t: tuple(map(str, t)),
    )
    return sorted(cols), rows


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()
PAIRED = sorted(k for k in QUERIES if k in ORACLES)


def test_every_oracle_has_a_query():
    missing = sorted(set(ORACLES) - set(QUERIES))
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", PAIRED)
def test_oracle_parity(spark, duck, name):
    df = QUERIES[name](spark, SF_ORACLE)
    s_cols, s_rows = _spark_rows(df)
    d_cols, d_rows = _duck_rows(duck, ORACLES[name])
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns, "entry() must have a stable schema"
