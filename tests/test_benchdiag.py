"""The bench-tail driver diagnostic (tools/benchdiag.py, round 9).

Contract under test (VERDICT r8 §Next 1 "done" criteria): the probe
exists, runs green against the local fixtures, its green-path output
fits the driver's 2000-char tail next to the ~1500-char compact bench
line, and a mismatch would actually be localized (the per-column bits
flip when a column diverges).
"""

from __future__ import annotations

import json

from tools import benchdiag


def test_diag_green_and_compact(spark):
    lines = benchdiag.diag_lines(spark, "/root/testdata/sf0.001")
    # green path: one E fingerprint + one K summary per key, no C/V/ERR
    ks = [ln for ln in lines if ln.startswith("DG K ")]
    assert [ln.split()[2] for ln in ks] == list(benchdiag.DIAG_KEYS)
    assert not any(ln.startswith(("DG C", "DG V", "DG ERR")) for ln in lines)
    for ln in ks:
        assert " m17=1 " in ln, ln
        # pandas fetch-path (toPandas/fetchdf) agreement — the duckdb
        # HUGEINT channel behind the r6-r8 driver reds stays closed
        assert " mp=1 " in ln, ln
        cb = ln.rsplit("cb=", 1)[1]
        assert set(cb) == {"1"}, ln
        s, o = ln.split(" s=")[1][:16], ln.split(" o=")[1][:16]
        assert s == o, ln
    # the distinct_users line carries per-variant bits, all green
    vb = ks[0].split("vb=")[1].split()[0]
    assert set(vb) == {"1"} and len(vb) >= 8
    # env fingerprint parses and answers the fixture-typing question
    e = next(ln for ln in lines if ln.startswith("DG E "))
    fp = json.loads(e[5:])
    assert "pq" in fp and "ddb" in fp and "jtz" in fp
    # tail budget: green-path diag must leave room for the ~1500-char
    # compact line inside the driver's 2000-char capture
    assert sum(len(ln) + 1 for ln in lines) <= 700, lines


def test_diag_localizes_a_divergent_column():
    """Synthetic frames: one flipped value → exactly that column's bit
    drops, its variant's bit drops, and a C detail line names it."""

    class FakeDF:
        columns = ["variant", "k", "n"]

        def __init__(self, rows):
            self._rows = rows

        def collect(self):
            return self._rows

    class FakeCur:
        description = [("variant",), ("k",), ("n",)]

        def fetchall(self):
            return [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)]

    sdf = FakeDF([("a", "x", 1), ("a", "y", 2), ("b", "x", 99)])
    out = benchdiag._key_lines("t", sdf, FakeCur())
    k = next(ln for ln in out if ln.startswith("DG K "))
    # sorted cols = [k, n, variant]: only n mismatches; variants sort
    # (a, b) and only b carries the flipped row
    assert "cb=101" in k and "vb=10" in k and "m17=0" in k
    assert any(ln.startswith("DG V t v=b cb=101") for ln in out)
    c = next(ln for ln in out if ln.startswith("DG C t c=n"))
    assert "sx=" in c and "ox=" in c
