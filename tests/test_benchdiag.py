"""The bench-tail driver diagnostic (tools/benchdiag.py, rounds 9-10).

Contract under test (VERDICT r8 §Next 1 + VERDICT r9 §Next 1 "done"
criteria): the probe exists, its observed key set is env-selectable and
rotates by round number by default, the green-path output fits the
driver's 2000-char tail next to the MEASURED compact bench line
(ADVICE r9: the previous fixed 700-char allowance could truncate the
env fingerprint), the fingerprint probe restores session conf, and a
mismatch would actually be localized (per-column bits flip when a
column diverges).
"""

from __future__ import annotations

import json

import __spark_entry__ as entry
from tools import benchdiag


def _worst_case_compact_len() -> int:
    """The driver-tail compact bench line, rendered pessimistically from
    the real registry (every timing 7 chars, 4-digit total)."""
    compact = {
        "metric": "total_query_sec",
        "value": 9999.999,
        "unit": "sec",
        "queries": {k: 999.999 for k in entry.queries()},
        "sf": 0.1,
        "n": 3,
    }
    return len(json.dumps(compact, separators=(",", ":")).encode())


def test_diag_key_rotation_and_override(monkeypatch):
    keys = sorted(entry.queries())
    monkeypatch.delenv("SPARK_GRAFT_DIAG_KEYS", raising=False)
    # the rotation FORMULA, pinned per round number (ADVICE r10: the
    # live _round_number counts committed BENCH_r{N} artifacts, so an
    # artifact commit must not silently change what this test checks)
    for rnd in (0, 7, 123):
        monkeypatch.setattr(benchdiag, "_round_number", lambda r=rnd: r)
        picked = benchdiag.diag_keys(keys)
        start = (rnd * benchdiag.DIAG_KEYS_N) % len(keys)
        window = [
            keys[(start + i) % len(keys)]
            for i in range(benchdiag.DIAG_KEYS_N)
        ]
        watch = [
            k for k in benchdiag.DIAG_WATCH.get(rnd, ())
            if k in keys and k not in window
        ]
        assert picked == window + watch
    # round-scoped WATCH keys append LAST and dedupe (VERDICT r10 §6)
    monkeypatch.setattr(benchdiag, "_round_number", lambda: 11)
    picked = benchdiag.diag_keys(keys)
    assert picked[-1] == "stream_batch_equiv"
    assert len(picked) == len(set(picked))
    # env override wins verbatim (watch keys do not sneak in)
    monkeypatch.setenv("SPARK_GRAFT_DIAG_KEYS", "doc_profile, q1")
    assert benchdiag.diag_keys(keys) == ["doc_profile", "q1"]


def test_trim_to_budget_keeps_suffix():
    lines = ["DG C detail " + "x" * 100, "DG K t n=1 s=a o=a", "DG E {}"]
    # generous budget: everything survives
    assert benchdiag.trim_to_budget(lines, 10_000) == lines
    # tight budget: the FRONT (detail) dies first, E survives last
    tight = benchdiag.trim_to_budget(lines, len(lines[1]) + len(lines[2]) + 2)
    assert tight == lines[1:]
    assert benchdiag.trim_to_budget(lines, 5) == []
    # the budget is BYTES, not characters (ADVICE r10): a detail line
    # carrying sampled non-ASCII data values bills at its encoded size
    wide = "DG C t c=k sx=éééé"  # 4 two-byte chars
    nbytes = len(wide.encode()) + 1
    assert benchdiag.trim_to_budget([wide], nbytes) == [wide]
    assert benchdiag.trim_to_budget([wide], nbytes - 1) == []
    # an oversized LAST line is skipped, not allowed to evict shorter
    # lines that still fit (code-review r10: a red-round compact line
    # shrinks the budget below the DG E fingerprint's length)
    big_last = ["DG K a ok", "DG K b ok", "DG E " + "y" * 500]
    assert benchdiag.trim_to_budget(big_last, 25) == ["DG K a ok", "DG K b ok"]


def test_diag_green_default_rotation_and_budget(spark, monkeypatch):
    """A PINNED rotation window runs green at sf0.001 and fits the
    measured tail budget without trimming. The round is monkeypatched
    (ADVICE r10): the live _round_number counts committed BENCH_r{N}
    artifacts, so without the pin an unrelated artifact commit would
    silently change which keys this test executes. Rotation-formula
    correctness is covered separately (and cheaply) above."""
    monkeypatch.delenv("SPARK_GRAFT_DIAG_KEYS", raising=False)
    monkeypatch.setattr(benchdiag, "_round_number", lambda: 0)
    lines = benchdiag.diag_lines(spark, "/root/testdata/sf0.001")
    ks = [ln for ln in lines if ln.startswith("DG K ")]
    assert [ln.split()[2] for ln in ks] == benchdiag.diag_keys(entry.queries())
    assert not any(ln.startswith(("DG C", "DG V", "DG ERR")) for ln in lines)
    for ln in ks:
        assert " m17=1 " in ln, ln
        assert " mp=1 " in ln, ln
        assert " t=" in ln, ln  # in-container timing evidence (r11)
        cb = ln.rsplit("cb=", 1)[1]
        assert set(cb) == {"1"}, ln
        s, o = ln.split(" s=")[1][:16], ln.split(" o=")[1][:16]
        assert s == o, ln
    # env fingerprint present, LAST (truncation-safe), and parseable
    assert lines[-1].startswith("DG E ")
    fp = json.loads(lines[-1][5:])
    assert "pq" in fp and "ddb" in fp and "jtz" in fp
    # tail budget: green-path diag + the MEASURED worst-case compact
    # line must fit the driver's 2000-byte capture (ADVICE r9; byte
    # accounting per ADVICE r10). One key more than the window (the
    # r11 DIAG_WATCH appendix) still fits: ~110 extra bytes vs the
    # ~180-byte slack this asserts.
    assert (
        sum(len(ln.encode()) + 1 for ln in lines)
        + _worst_case_compact_len() + 1
        <= 2000 - 120
    ), lines


def test_diag_green_variant_key(spark, monkeypatch):
    """A variant-bearing key via the env override: per-variant bits
    present and all green (the r9 solved-case keys stay reachable)."""
    monkeypatch.setenv("SPARK_GRAFT_DIAG_KEYS", "distinct_users")
    lines = benchdiag.diag_lines(spark, "/root/testdata/sf0.001")
    ks = [ln for ln in lines if ln.startswith("DG K ")]
    assert len(ks) == 1 and " distinct_users " in ks[0]
    vb = ks[0].split("vb=")[1].split()[0]
    assert set(vb) == {"1"} and len(vb) >= 8


def test_fingerprint_restores_session_conf(spark):
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/events.parquet')"
        )
        fp = json.loads(
            benchdiag._fingerprint(spark, "/root/testdata/sf0.001", con)
        )
    finally:
        con.close()
    assert fp["spk"] and not fp["spk"].startswith("ERR")
    # the probe's nanosAsLong override must not leak into the session
    assert spark.conf.get(key, None) == prev


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
