"""Engine-neutral integer logarithm — zero query-time libm (round 8).

CORRECTNESS_r06/r07 went hash-red on ``doc_profile`` in the driver's
environment while every local run was green: the lm_score grid absorbed
1-ulp JVM-vs-DuckDB ``ln()`` divergence everywhere EXCEPT at dyadic
boundary ties, and a different libm build (newer duckdb wheel) flips a
boundary-adjacent term deterministically (VERDICT r7 §What's wrong 1).
Quantizing a transcendental can shrink the disagreement surface but
never close it — the only version-portable contract is to never call
``ln()``/``log()`` at query time at all.

Every log in a hashed output has an INTEGER argument domain by
construction (term counts + 1, document frequencies, count products),
so the fix is a deterministic fixed-point binary logarithm DEFINED as
an exact integer algorithm both engines run step-for-step:

    ilog2_units(x) ≈ floor(log2(x) · 2^30)   for integer 1 ≤ x < 2^62

computed by the classic shift-and-square method (Majithia & Levan 1973;
also Knuth TAOCP §1.2.2 ex. 25):

    e   = bit_length(x) - 1                  (exponent)
    m   = x · 2^(30-e)   if e ≤ 30           (mantissa in [2^30, 2^31),
          ⌊x / 2^(e-30)⌋  otherwise           i.e. [1, 2) in Q30)
    30×: m ← ⌊m² / 2^30⌋;  if m ≥ 2^31: bit=1, m ← ⌊m/2⌋ else bit=0
    result = e·2^30 + (bit₁bit₂…bit₃₀)₂

Every step is int64 arithmetic (m < 2^31 so m² < 2^62). The Spark plan
runs it as ONE ``aggregate(sequence(1,30), …)`` fold; the DuckDB oracle
as a ``SELECT * REPLACE`` chain built from the same step fragments; the
Python reference (``ilog2_py``) as a plain loop — three renderings of
one integer recurrence, pinned byte-identical on the full domain
boundary set by tests/test_hashing_properties.py, so the two engines
cannot disagree on ANY input, under ANY library version: there is no
floating-point op in the definition, only the final exact dyadic
division by 2^30 (an exponent shift).

The truncation error vs true log2 is < 2^-25 (30 squarings each
truncating ≤ 2^-30 relative, plus the final-bit floor); callers treat
ilog2 as the DEFINITION of the score, not an approximation of libm —
``tests/test_hashing_properties.py`` pins the Python reference, the
Spark chain, and the DuckDB chain to byte-identical outputs and checks
|units/2^30 − log2(x)| < 1e-7 over the domain.

Division by powers of two uses the ``(n - n % d) / d`` exact-double
trick from operators/sketches._hll_exact_div, valid here beyond 2^53:
``n - n % d`` is a multiple of d = 2^p below 2^62, so it carries at
most 62-p ≤ 61 significant bits only when p ≥ 9 — the two uses are
p = 30 (≤ 32 bits) and p ∈ {1, …, 31} on values < 2^32 (≤ 31 bits),
both exactly representable, and the quotient is an exact power-of-two
exponent shift.
"""
from __future__ import annotations

import math as _math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point fractional bits: units are 2^-30 — the same grid as
#: rounding.DYADIC_SUM_Q and the retired LM_LOG_Q, so downstream
#: exact-integer-sum envelopes carry over unchanged.
ILOG2_F = 30
ILOG2_Q = 1 << ILOG2_F
#: domain: 1 <= x < 2^62 (int64-safe mantissa extraction).
ILOG2_MAX_BITS = 62
ILOG2_MAX = 1 << ILOG2_MAX_BITS


def ilog2_py(x: int) -> int:
    """Python reference — bit-for-bit the algorithm the SQL runs.

    Use for scalars already on the driver (e.g. a collected count):
    embedding ilog2_py(N) as a literal is identical to running the SQL
    chain on N, by construction."""
    if not 1 <= x < ILOG2_MAX:
        raise ValueError(f"ilog2 domain is [1, 2^62): got {x}")
    e = x.bit_length() - 1
    m = x << (ILOG2_F - e) if e <= ILOG2_F else x >> (e - ILOG2_F)
    acc = 0
    for _ in range(ILOG2_F):
        m = (m * m) >> ILOG2_F
        if m >= (1 << (ILOG2_F + 1)):
            acc = acc * 2 + 1
            m >>= 1
        else:
            acc = acc * 2
    return e * ILOG2_Q + acc


def _div_pow2(num: str, p: int) -> str:
    """Exact ⌊num / 2^p⌋ as shared ANSI (see module docstring)."""
    d = 1 << p
    return f"CAST(round((({num}) - (({num}) % {d})) / {d}) AS BIGINT)"


def _bitlen_case(expr: str) -> str:
    """bit_length of a value in [1, 2^62) — 62-branch exact CASE."""
    branches = " ".join(
        f"WHEN ({expr}) >= {1 << (k - 1)} THEN {k}"
        for k in range(ILOG2_MAX_BITS, 0, -1)
    )
    return f"CASE {branches} ELSE 0 END"


def _m0_case(x: str, e: str) -> str:
    """Initial Q30 mantissa in [2^30, 2^31) from (x, e=bitlen-1)."""
    branches = []
    for k in range(ILOG2_MAX_BITS):
        if k <= ILOG2_F:
            branches.append(f"WHEN {k} THEN ({x}) * {1 << (ILOG2_F - k)}")
        else:
            branches.append(f"WHEN {k} THEN {_div_pow2(x, k - ILOG2_F)}")
    return f"CASE ({e}) {' '.join(branches)} END"


def _step_exprs() -> tuple[str, str]:
    """One shift-and-square step over columns (_m, _acc) — the shared
    (next _m, next _acc) ANSI pair. Within a single SELECT both
    references resolve to the INPUT columns (no lateral-alias capture
    in either engine), so one projection per step updates both."""
    q = _div_pow2("(_m) * (_m)", ILOG2_F)
    hi = 1 << (ILOG2_F + 1)
    m_next = f"CASE WHEN {q} >= {hi} THEN {_div_pow2(q, 1)} ELSE {q} END"
    acc_next = f"(_acc) * 2 + (CASE WHEN {q} >= {hi} THEN 1 ELSE 0 END)"
    return m_next, acc_next


def with_ilog2(df: DataFrame, x_expr: str, out: str) -> DataFrame:
    """Append ``out`` = ilog2_units(x_expr) to ``df`` (Spark side).

    ONE ``aggregate(sequence(1, 30), …)`` fold expression of per-row
    int64 arithmetic — no shuffle, no UDF. The round-8 first cut chained
    30 selectExpr projections instead; Catalyst's CollapseProject merged
    them by substituting each step's aliases into the next step's 8
    references, growing the optimized expression tree multiplicatively —
    pmi/tfidf/bm25 regressed 2-5× on pure planning/codegen time
    (BENCH_local r8 A/B). The fold keeps the tree constant-size and the
    30 iterations a runtime loop. It evaluates on Spark's interpreted
    HOF path, which is why callers apply it on the SMALLEST frame with
    the needed integers (term-level counts, scalar rows), never per
    corpus row, and join/broadcast the result downstream.

    The step recurrence is the SAME integer algorithm the DuckDB chain
    (ilog2_oracle_sql) and the Python reference (ilog2_py) run —
    three-way bit-equality pinned by tests/test_hashing_properties.py.
    Spark-only cheapenings that cannot change a bit: the exponent/
    mantissa CASEs stay in the codegen'd projection (only the loop is
    interpreted), and ⌊n/2^p⌋ on non-negative int64 is shiftright(n, p)
    — identical integers to the oracle's (n - n%d)/d form."""
    guard = (
        f"CASE WHEN _x >= 1 AND _x < {ILOG2_MAX} THEN _x ELSE "
        f"CAST(raise_error(CONCAT('ilog2 domain is [1, 2^62): got ', "
        f"CAST(_x AS STRING))) AS BIGINT) END"
    )
    df = (
        df.withColumn("_x", F.expr(f"CAST({x_expr} AS BIGINT)"))
        # same domain contract as ilog2_py: x=0 would silently yield
        # -2^30 and a negative x wraps in Spark but overflows in DuckDB
        # — the exact engine-divergence class this module eliminates,
        # so fail loudly instead (code-review r8 finding)
        .withColumn("_x", F.expr(guard))
        .withColumn("_e", F.expr(f"{_bitlen_case('_x')} - 1"))
        .withColumn(
            "_m0",
            F.expr(
                f"CASE WHEN _e <= {ILOG2_F} THEN"
                f" shiftleft(_x, {ILOG2_F} - _e)"
                f" ELSE shiftright(_x, _e - {ILOG2_F}) END"
            ),
        )
    )
    hi = 1 << (ILOG2_F + 1)
    q = f"shiftright((s.m) * (s.m), {ILOG2_F})"
    fold = (
        f"aggregate(sequence(1, {ILOG2_F}), "
        f"struct(CAST(_m0 AS BIGINT) AS m, CAST(0 AS BIGINT) AS acc), "
        f"(s, i) -> struct("
        f"CAST(CASE WHEN {q} >= {hi} THEN shiftright({q}, 1)"
        f" ELSE {q} END AS BIGINT) AS m, "
        f"CAST(s.acc * 2 + (CASE WHEN {q} >= {hi} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS acc), "
        f"s -> CAST(_e AS BIGINT) * {ILOG2_Q} + s.acc)"
    )
    return df.withColumn(out, F.expr(fold)).drop("_x", "_e", "_m0")


# --------------------------------------------------------------------------
# Engine-neutral logistic sigmoid (dyadic exp2) — the serial-SGD link
# --------------------------------------------------------------------------
# The spam fold's p = 1/(1+e^-s) evaluated libm exp() in CPython (the
# mapInPandas fold) and in DuckDB (the replay oracle) and trusted the
# two to agree bit-for-bit — true when both bind the same platform libm,
# but a duckdb wheel with its own vendored math flips a gradient-grid
# boundary tie exactly like the lm_score ln() channel (VERDICT r7).
# Round 8 replaces exp() with a deterministic dyadic 2^x:
#
#   u  = clamp(s · log2e, ±64)            (one shared double constant)
#   t  = -u;  n = ⌊t⌋;  fq = min(⌊(t-n)·2^30⌋, 2^30-1)
#   r  = 2^30; for j in 0..29: if bit (29-j) of fq: r ← (r·C_j) >> 30
#        where C_j = round(2^(2^-(j+1)) · 2^30)   (Python-precomputed
#        constants — BOTH sides consume these integers, so no runtime
#        pow/exp is ever version-sensitive)
#   p  = 1 / (1 + r·2^(n-30))             (exact power-of-two scaling)
#
# Every step is int64 arithmetic or a correctly-rounded IEEE op on
# identical inputs. |relative error| vs true 2^x is < 2^-25 — the link
# is DEFINED as this algorithm (a deterministic logistic approximant),
# not as libm's exp. The ±64 clamp (vs the old ±709 e-base clamp) is
# semantics-free: beyond |u|=54, 1+2^-u == 1.0 in doubles and the old
# clamp only ever guarded overflow. pow(2.0, k) for integer k in
# [-94, 34] is an exact power in every IEEE implementation (the
# oracles.py float-decompose idiom) and mirrors Python math.ldexp.

LOG2E = 1.0 / _math.log(2.0)
SIGMOID_CLAMP = 64.0
EXP2_F = 30
EXP2_ONE = 1 << EXP2_F
#: C_j = round(2^(2^-(j+1)) · 2^30): computed once here; the oracle SQL
#: embeds the resulting INTEGERS, so both engines share one definition.
EXP2_CONSTS = tuple(
    round(2.0 ** (2.0 ** -(j + 1)) * EXP2_ONE) for j in range(EXP2_F)
)


def sigmoid_py(s: float) -> float:
    """p = 1/(1+2^(-s·log2e)) via the dyadic exp2 — the Python side
    (the mapInPandas SGD fold). Bit-for-bit the oracle's SQL chain."""
    u = max(min(s * LOG2E, SIGMOID_CLAMP), -SIGMOID_CLAMP)
    t = -u
    n = _math.floor(t)
    fq = min(_math.floor((t - n) * EXP2_ONE), EXP2_ONE - 1)
    r = EXP2_ONE
    for j, c in enumerate(EXP2_CONSTS):
        if fq % (1 << (EXP2_F - j)) >= (1 << (EXP2_F - 1 - j)):
            r = (r * c) >> EXP2_F
    return 1.0 / (1.0 + _math.ldexp(float(r), n - EXP2_F))


def sigmoid_oracle_sql(src: str, s_expr: str, out: str) -> str:
    """DuckDB replay: wrap subquery ``src``, appending ``out`` =
    sigmoid(s_expr); other columns pass through. DuckDB-only dialect
    (``//``, ``* REPLACE``) is fine here — the counterpart is the
    Python fold, pinned equal by tests/test_ml.py."""
    sql = (
        f"SELECT *, greatest(least(({s_expr}) * {LOG2E!r}, "
        f"{SIGMOID_CLAMP!r}), -{SIGMOID_CLAMP!r}) AS _su FROM ({src})"
    )
    sql = f"SELECT *, CAST(floor(-_su) AS BIGINT) AS _sn FROM ({sql})"
    sql = (
        f"SELECT *, least(CAST(floor(((-_su) - _sn) * {EXP2_ONE}) AS "
        f"BIGINT), {EXP2_ONE - 1}) AS _sf, "
        f"CAST({EXP2_ONE} AS BIGINT) AS _sr FROM ({sql})"
    )
    for j, c in enumerate(EXP2_CONSTS):
        mod = 1 << (EXP2_F - j)
        hi = 1 << (EXP2_F - 1 - j)
        sql = (
            f"SELECT * REPLACE ((CASE WHEN (_sf % {mod}) >= {hi} "
            f"THEN (_sr * {c}) // {EXP2_ONE} ELSE _sr END) AS _sr) "
            f"FROM ({sql})"
        )
    return (
        f"SELECT * EXCLUDE (_su, _sn, _sf, _sr), "
        f"1.0 / (1.0 + (CAST(_sr AS DOUBLE) * pow(2.0::DOUBLE, "
        f"CAST(_sn - {EXP2_F} AS DOUBLE)))) AS {out} FROM ({sql})"
    )


def ilog2_oracle_sql(src: str, x_expr: str, out: str) -> str:
    """DuckDB replay: wrap subquery ``src``, appending ``out`` =
    ilog2_units(x_expr); every other column of ``src`` passes through.
    Uses DuckDB ``* REPLACE``/``* EXCLUDE`` for the per-step projection
    — the STEP EXPRESSIONS are the same strings the Spark side runs."""
    m_next, acc_next = _step_exprs()
    # same domain guard as with_ilog2/ilog2_py (code-review r8 finding)
    x_guarded = (
        f"CASE WHEN CAST({x_expr} AS BIGINT) >= 1 AND "
        f"CAST({x_expr} AS BIGINT) < {ILOG2_MAX} "
        f"THEN CAST({x_expr} AS BIGINT) "
        f"ELSE CAST(error('ilog2 domain is [1, 2^62)') AS BIGINT) END"
    )
    sql = (
        f"SELECT *, {_m0_case('_x', '_e')} AS _m, "
        f"CAST(0 AS BIGINT) AS _acc FROM ("
        f"SELECT *, {_bitlen_case('_x')} - 1 AS _e FROM ("
        f"SELECT *, {x_guarded} AS _x FROM ({src})))"
    )
    for _ in range(ILOG2_F):
        sql = (
            f"SELECT * REPLACE (CAST({m_next} AS BIGINT) AS _m, "
            f"CAST({acc_next} AS BIGINT) AS _acc) FROM ({sql})"
        )
    return (
        f"SELECT * EXCLUDE (_x, _e, _m, _acc), "
        f"CAST(_e AS BIGINT) * {ILOG2_Q} + _acc AS {out} FROM ({sql})"
    )
