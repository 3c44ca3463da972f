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


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-8000.0, max_value=8000.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1, max_size=8,
    )
)
def test_dyadic_quantizer_three_way_bit_identity(spark, duck, xs):
    """floor(x·2^40 + 0.5)/2^40 — the contract three operator families
    rest on (ml.DYADIC_Q, graph.PR_Q, batch GD) — must produce the
    BIT-IDENTICAL double in CPython, Spark, and DuckDB for any input in
    the exactness envelope, and its outputs must be exact 2^-40
    multiples (so sums of them are order-independent)."""
    import math
    import struct

    con = duck
    Q = float(1 << 40)
    py = [math.floor(x * Q + 0.5) / Q for x in xs]
    rows = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, x double")
    sp = [
        r.q
        for r in rows.select(
            "i", (F.floor(F.col("x") * F.lit(Q) + F.lit(0.5)).cast("double") / F.lit(Q)).alias("q")
        ).orderBy("i").collect()
    ]
    # parameter binding hands DuckDB the native double (the shape the
    # contracts run in: values arrive via parquet, not literals) —
    # a repr-literal embedding was tried here first and FOUND A REAL
    # HAZARD: DuckDB's DECIMAL→DOUBLE literal cast double-rounds for
    # 17-significant-digit values (now fixed at the one affected
    # oracle site via oracles.sql_double, asserted below)
    dk = [
        con.execute(
            f"SELECT floor(? * {Q!r}::DOUBLE + 0.5) / {Q!r}::DOUBLE", [x]
        ).fetchone()[0]
        for x in xs
    ]
    from uw_hadoop_aglorithms_spark.oracles import sql_double

    for x in xs:
        rt = con.execute(f"SELECT {sql_double(x)}").fetchone()[0]
        assert struct.pack("<d", rt) == struct.pack("<d", x), (x, rt)
    bits = lambda v: struct.pack("<d", v)  # noqa: E731
    for a, b, c in zip(py, sp, dk):
        assert bits(a) == bits(b) == bits(c), (a, b, c)
        assert a * Q == math.floor(a * Q), a  # exact dyadic multiple
