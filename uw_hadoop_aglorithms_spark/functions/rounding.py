"""Signed-zero-safe rounding — closing the ±0.0 value-hash channel.

The driver canonicalizer formats floats with ``%.9g``, so ``-0.0``
hashes as ``"-0"`` which is not ``"0"``. Spark's ``round()`` (BigDecimal
HALF_UP) DROPS the sign of a negative value that rounds to zero, while
DuckDB's ``round()`` keeps it — one engine emits ``+0.0``, the other
``-0.0``, and a numerically-"equal" row hash-flips (VERDICT r6 §What's
wrong 1b). IEEE ``-0.0 + 0.0 = +0.0`` and ``x + 0.0 = x`` for every
other value (including NaN and ±inf), so appending ``+ 0.0`` normalizes
the signed zero without disturbing anything else.

Contract: every NEGATIVE-CAPABLE rounded float output column applies
this in BOTH engines — the matching DuckDB oracle fragment appends the
same ``+ 0.0``. Applying it on one side only would BREAK columns where
both engines currently agree on ``-0.0``, so the two sides must move in
lockstep (grep for ``fround``/``SQL_POSZERO`` to audit the pairing).
Strictly non-negative outputs (counts, revenues, ratios of non-negative
sums) cannot round to ``-0.0`` and stay on plain ``round()``.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Append to a DuckDB round(...) fragment for the oracle side of the pair.
SQL_POSZERO = " + 0.0"

#: Quantize-then-exact-sum contract for ARBITRARY-double measures that
#: get summed (BM25 per-term scores, curation quality averages): each
#: per-item value v becomes floor(v·2^30 + 0.5) integer units (exact
#: IEEE steps, ~9.3e-10 grid — the lm_score coarseness), the sum runs
#: over BIGINT/DECIMAL(38,0) in Spark and BIGINT/HUGEINT in DuckDB
#: (exact, order-independent at any scale), and ONE exact division by
#: 2^30 produces the output — no engine round() semantics, no
#: summation-order dependence. Fixed-decimal money columns use exact
#: cents instead (operators/relational.py money contract).
DYADIC_SUM_Q = 1 << 30


def fround(col: Column | str, scale: int) -> Column:
    """``F.round`` that can never emit ``-0.0`` (see module docstring)."""
    return F.round(col, scale) + F.lit(0.0)
