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


# --------------------------------------------------------------------------
# engine-neutral HLL (round 6): generated-SQL semantics vs a pure-Python
# reference, three ways (Spark expr / DuckDB SQL / Python model)
# --------------------------------------------------------------------------

def _py_hll_mix(k: int) -> int:
    from uw_hadoop_aglorithms_spark.operators import sketches

    a, b = hashing.hash_params(sketches.HLL_SEED_MIX)
    # Python % matches SQL's truncated % only for non-negative operands;
    # mirror C-style truncation explicitly for negative keys
    t = k - (k // hashing.P) * hashing.P if k >= 0 else -((-k) % hashing.P)
    t = t * a + b
    t = t % hashing.P if t >= 0 else -((-t) % hashing.P)
    return (t * t) % hashing.P


def _py_hll_bucket(k: int) -> int:
    from uw_hadoop_aglorithms_spark.operators import sketches

    a, b = hashing.hash_params(sketches.HLL_SEED_B)
    v = (_py_hll_mix(k) * a + b) % hashing.P
    return (v * sketches.HLL_M) // hashing.P


def _py_hll_rho(k: int) -> int:
    from uw_hadoop_aglorithms_spark.operators import sketches

    a, b = hashing.hash_params(sketches.HLL_SEED_RHO)
    v = (_py_hll_mix(k) * a + b) % hashing.P
    return sketches.HLL_RHO_BITS + 1 - v.bit_length()


def _py_hll_estimate(keys):
    import math

    from uw_hadoop_aglorithms_spark.operators import sketches

    m = sketches.HLL_M
    regs = [0] * m
    for k in keys:
        b, r = _py_hll_bucket(k), _py_hll_rho(k)
        if r > regs[b]:
            regs[b] = r
    s = sum(1 << (31 - r) if r else 1 << 31 for r in regs)
    raw = sketches.HLL_C // s
    v = regs.count(0)
    if v > 0 and raw <= sketches.HLL_LC_THRESH:
        return round(m * math.log(m / v)), v
    return raw, v


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**12), max_value=10**12),
        min_size=1,
        max_size=60,
    )
)
def test_hll_three_way_agreement(duck, keys):
    """DuckDB's generated bucket/rho/estimate SQL == the pure-Python HLL
    model on arbitrary int64 keys INCLUDING negative ones (the docstring
    claims sign-safety via the squaring; this pins it), and the whole
    estimate pipeline agrees end to end."""
    from uw_hadoop_aglorithms_spark.operators import sketches

    py_pairs = sorted({(_py_hll_bucket(k), _py_hll_rho(k)) for k in keys})
    duck.execute("DROP TABLE IF EXISTS hll_keys")
    duck.execute("CREATE TABLE hll_keys(k BIGINT)")
    duck.executemany("INSERT INTO hll_keys VALUES (?)", [(k,) for k in keys])
    got = duck.execute(
        f"SELECT DISTINCT {sketches.hll_bucket_sql('k')} AS b,"
        f" {sketches.hll_rho_sql('k')} AS rho FROM hll_keys ORDER BY 1, 2"
    ).fetchall()
    assert [tuple(r) for r in got] == py_pairs

    est_sql = sketches.hll_oracle_estimate(
        f"SELECT 'g' AS g, 'd' AS dt, {sketches.hll_bucket_sql('k')} AS b,"
        f" max({sketches.hll_rho_sql('k')}) AS rho FROM hll_keys GROUP BY 1, 2, 3"
    )
    g, v_empty, est, sum_rho, sum_w = duck.execute(est_sql).fetchone()
    py_est, py_v = _py_hll_estimate(keys)
    assert (est, v_empty) == (py_est, py_v)
    regs: dict[int, int] = {}
    for b, r in py_pairs:  # registers keep max(rho) per bucket
        regs[b] = max(regs.get(b, 0), r)
    assert sum_rho == sum(regs.values())
    assert sum_w == sum((b + 1) * r for b, r in regs.items())


# --- engine-neutral integer log2 (functions/intlog.py, round 8) -------------

INTLOG_EDGES = [
    1, 2, 3, 4, 5, 7, 8, 63, 64, 65,
    (1 << 30) - 1, 1 << 30, (1 << 30) + 1,
    (1 << 31) - 1, 1 << 31, (1 << 31) + 1,
    10**9, 10**12, 10**15, (1 << 53) - 1, 1 << 53,
    (1 << 61), (1 << 62) - 1,
]


def test_ilog2_accuracy_and_monotonicity():
    """ilog2_py IS the definition (not a libm approximation), but it must
    track true log2 within its documented 2^-25 truncation bound and be
    monotone — otherwise downstream rankings (tfidf windows) could
    invert."""
    import math

    from uw_hadoop_aglorithms_spark.functions import intlog

    prev = -1
    for x in sorted(INTLOG_EDGES):
        k = intlog.ilog2_py(x)
        assert abs(k / intlog.ILOG2_Q - math.log2(x)) < 2**-24, x
        assert k >= prev, f"non-monotone at {x}"
        prev = k
    # exact powers of two hit the grid exactly
    for e in (0, 1, 10, 30, 45, 61):
        assert intlog.ilog2_py(1 << e) == e * intlog.ILOG2_Q


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=(1 << 62) - 1),
        min_size=1,
        max_size=40,
    )
)
def test_ilog2_duckdb_matches_python(duck, xs):
    """The generated DuckDB REPLACE-chain == ilog2_py, bit for bit, over
    the full [1, 2^62) domain — the oracle side of the no-query-time-libm
    contract."""
    from uw_hadoop_aglorithms_spark.functions import intlog

    src = (
        "SELECT unnest(["
        + ",".join(str(v) for v in xs)
        + "]::BIGINT[]) AS x"
    )
    got = duck.execute(
        f"SELECT x, k FROM ({intlog.ilog2_oracle_sql(src, 'x', 'k')})"
    ).fetchall()
    assert len(got) == len(xs)
    for x, k in got:
        assert int(k) == intlog.ilog2_py(int(x)), x


def test_ilog2_spark_matches_python(spark):
    """The Spark selectExpr chain == ilog2_py on edge values + a seeded
    random sweep (one job; hypothesis-free to keep it a single plan)."""
    import random

    from uw_hadoop_aglorithms_spark.functions import intlog

    rng = random.Random(0xB10)
    xs = INTLOG_EDGES + [rng.randrange(1, 1 << 62) for _ in range(150)]
    df = spark.createDataFrame([(v,) for v in xs], "x long")
    for r in intlog.with_ilog2(df, "x", "k").collect():
        assert r.k == intlog.ilog2_py(r.x), r.x


def test_ilog2_domain_guard_fires_on_both_engines(spark, duck):
    """x outside [1, 2^62) must raise EXPLICITLY in the Spark fold and
    the DuckDB chain (matching ilog2_py) — x=0 would silently yield
    -2^30 and a negative x wraps in Spark but overflows in DuckDB, the
    exact engine-divergence class intlog exists to eliminate."""
    import pytest as _pytest

    from uw_hadoop_aglorithms_spark.functions import intlog

    for bad in (0, -5, 1 << 62):
        with _pytest.raises(Exception, match="ilog2 domain"):
            intlog.with_ilog2(
                spark.createDataFrame([(bad,)], "x long"), "x", "k"
            ).collect()
        with _pytest.raises(Exception, match="ilog2 domain"):
            duck.execute(
                intlog.ilog2_oracle_sql(f"SELECT {bad}::BIGINT AS x", "x", "k")
            ).fetchall()
