"""Every oracle's OUTPUT schema must stay in the engine-portable type
set (round-9 finding).

``CORRECTNESS_r06..r08`` were hash-red on exactly 2 of 50 keys
(``distinct_users``, ``doc_profile``) while every local sweep — shapes,
zones, scale factors, a 17-significant-digit exact-rendering compare —
stayed green and the driver's own versions block matched local. The
localizing fact: those two keys were EXACTLY the two whose oracle SQL
surfaced a HUGEINT (int128) output column — duckdb types integer
``sum()`` as HUGEINT, and a UNION ALL promotes sibling branches, so
``distinct_users``' whole ``n``/``v`` columns and ``doc_profile``'s
``sp_dup_starts`` rode int128. Python ``fetchall()`` converts HUGEINT
to a plain ``int`` (which is why no local sim could ever reproduce a
difference), but a harness fetching through pandas/arrow renders
HUGEINT as float64/decimal — a value-hash mismatch with rows and schema
still matching, appearing exactly when the sum-bearing members were
added (round 6), surviving the libm purge and identical engine
versions. Both sites now CAST to BIGINT; this test pins the invariant:
no oracle output column may type HUGEINT / DECIMAL / UINT*, whose
client-side rendering is fetch-path-dependent.

``DESCRIBE (<sql>)`` is type-level only — no query execution — so this
covers all ~50 oracles in seconds.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: fetch-path-dependent client renderings — banned from oracle output
BANNED_TYPES = ("HUGEINT", "INT128", "DECIMAL", "UHUGEINT", "UINT")


def _oracles():
    import __spark_entry__ as entry

    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize("key,sql", _oracles(), ids=lambda v: v if isinstance(v, str) and len(v) < 40 else None)
def test_oracle_output_types_are_portable(duck, key, sql):
    rows = duck.execute(f"DESCRIBE ({sql})").fetchall()
    odd = [
        (name, coltype)
        for name, coltype, *_ in rows
        if any(b in str(coltype).upper() for b in BANNED_TYPES)
    ]
    assert not odd, (
        f"{key}: fetch-path-dependent output type(s) {odd} — cast to "
        "BIGINT/DOUBLE in the oracle SQL (module docstring)"
    )


def _dtype_class(t: str) -> str:
    t = t.upper()
    if any(x in t for x in ("BIGINT", "INT", "LONG", "SHORT", "BYTE")):
        return "int"
    if any(x in t for x in ("DOUBLE", "FLOAT", "REAL", "DECIMAL")):
        return "float"
    if "BOOL" in t:
        return "bool"
    # DATE and TIMESTAMP are distinct classes: a cross-side split
    # renders "2024-01-15" vs "2024-01-15 00:00:00"
    if "TIMESTAMP" in t:
        return "timestamp"
    if "DATE" in t:
        return "date"
    return "str"


def test_spark_and_oracle_agree_on_column_dtype_classes(spark, duck):
    """Sideways guard for the same family: a column typed int on one
    engine side and float on the other renders "5" vs "5.0" under a
    str()-style canonicalizer while %.9g hides it — exactly how the
    HUGEINT channel stayed invisible locally. Every key's columns must
    agree on numeric CLASS (int/float/bool/time/str) across engines.

    Runs every queries() callable at sf0.001 for its schema; the eager
    suite members (layout writes, ann threads) make this the one
    multi-minute test in the file — it is the price of pinning the
    whole cross-engine type surface."""
    import __spark_entry__ as entry

    qmap, omap = entry.queries(), entry.oracle_sql()
    bad = {}
    for k in sorted(qmap):
        ssch = {
            f.name: _dtype_class(f.dataType.simpleString())
            for f in qmap[k](spark, "/root/testdata/sf0.001").schema.fields
        }
        osch = {
            name: _dtype_class(str(t))
            for name, t, *_ in (
                tuple(x) for x in duck.execute(f"DESCRIBE ({omap[k]})").fetchall()
            )
        }
        diff = {
            c: (ssch.get(c), osch.get(c))
            for c in set(ssch) | set(osch)
            if ssch.get(c) != osch.get(c)
        }
        if diff:
            bad[k] = diff
    assert not bad, f"cross-side dtype-class mismatch: {bad}"
