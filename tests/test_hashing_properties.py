"""Generative bit-exactness tests for the engine-neutral hash
(functions/hashing.py) — the foundation every hash-based dedup oracle
stands on. Hypothesis drives printable-ASCII inputs (the hash's
documented domain: ascii() semantics diverge between engines beyond
ASCII); each example batch is one Spark job."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.functions import hashing

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


def _py_polyhash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % hashing.P
    return h


@settings(max_examples=5, deadline=None)
@given(st.lists(ASCII, min_size=1, max_size=30))
def test_polyhash_three_way_agreement(spark, strings):
    """Spark column expr == DuckDB SQL == pure-Python model, bit for bit."""
    py = [_py_polyhash(s) for s in strings]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got_spark = [
        r.h for r in df.select(hashing.polyhash(F.col("s")).alias("h")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {hashing.polyhash_sql('?')}", [s]).fetchone()[0]
        for s in strings
    ]
    assert got_spark == py
    assert got_duck == py


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=hashing.P - 1), st.integers(0, 200))
def test_uhash_family_stays_in_range_and_is_deterministic(ph, i):
    a, b = hashing.hash_params(i)
    v = (ph * a + b) % hashing.P
    assert 0 <= v < hashing.P
    assert hashing.hash_params(i) == (a, b)
    # distinct members disagree somewhere (family is non-degenerate)
    a2, b2 = hashing.hash_params(i + 1)
    assert (a, b) != (a2, b2)
