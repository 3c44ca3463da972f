"""Unit pins for THE shared canonicalizer (tools/canon.py) — the one
rendering every cross-engine value hash flows through (driver_sim,
flake_harness, benchdiag). ADVICE r9: numpy datetime64 scalars must
render identically regardless of storage unit."""

from __future__ import annotations

import numpy as np

from tools.canon import lines_of, norm, vhash


def test_datetime64_unit_invariance():
    # ns (and finer) .item()s to a raw epoch int — norm must still take
    # the isoformat path, identical to the coarser units
    want = "2024-01-01 12:34:56.789000"
    for unit in ("ms", "us", "ns"):
        assert norm(np.datetime64("2024-01-01T12:34:56.789", unit)) == want
    assert norm(np.datetime64("2024-01-01T12:34:56", "s")) == "2024-01-01 12:34:56"
    # D-unit stays a bare date (matches python datetime.date rendering)
    assert norm(np.datetime64("2024-01-01", "D")) == "2024-01-01"
    assert norm(np.datetime64("NaT", "ns")) == "NULL"


def test_sub_microsecond_instant_same_hash_across_scalar_types():
    # ADVICE r10: a sub-us instant must render identically whether it
    # reaches the canonicalizer as np.datetime64[ns] (truncated to us by
    # the numpy branch) or as pd.Timestamp (isoformat would otherwise
    # print all 9 digits) — one precision, no fetch-path fork
    import pandas as pd

    want = "2024-01-01 12:34:56.123456"
    assert norm(np.datetime64("2024-01-01T12:34:56.123456789")) == want
    assert norm(pd.Timestamp("2024-01-01 12:34:56.123456789")) == want
    # exact-us values are untouched
    assert norm(pd.Timestamp("2024-01-01 12:34:56.123456")) == want
    # pd.NaT (nanosecond=nan) must skip the truncation branch and keep
    # its HISTORICAL rendering: isoformat 'NaT' -> the T->space replace
    # -> 'Na '. Ugly but symmetric (both engines' pandas fetch paths
    # yield pd.NaT for NULL timestamps) and baked into committed
    # artifact hashes — pinned so nobody "fixes" it one-sided.
    assert norm(pd.NaT) == "Na "


def test_numpy_scalars_match_python_scalars():
    assert norm(np.int64(150)) == norm(150) == "150"
    assert norm(np.float64(1.5)) == norm(1.5) == "1.5"
    assert norm(np.float64("nan")) == "NaN"
    assert norm(np.bool_(True)) == norm(True) == "True"


def test_lines_and_hash_are_column_name_sorted_and_order_insensitive():
    a = lines_of(["b", "a"], [(1, "x"), (2, "y")])
    b = lines_of(["b", "a"], [(2, "y"), (1, "x")])
    assert a == b == ["x|1", "y|2"]
    assert vhash(a) == vhash(b)
