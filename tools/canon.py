"""THE canonicalizer for cross-engine value comparison — one copy.

tools/driver_sim.py (the local driver simulation), tools/benchdiag.py
(the DG lines committed back through the driver's bench stdout tail),
and tools/flake_harness.py artifacts all hash result frames with these
exact renderings; the DG hashes are only diagnostic because they
compare BYTE-FOR-BYTE against the committed FLAKE/DIVERGENCE hashes,
so the canonicalizer must not fork (code-review r9: the previous
copy-with-a-comment is precisely how a phantom cross-environment
divergence gets manufactured).

Contract (matches the driver harness's observed behavior):
- rows are rendered column-sorted by column NAME, '|'-joined, then the
  row lines are sorted (order-insensitive);
- floats via '%.9g' ('NaN' for NaN), None as 'NULL', datetimes as
  isoformat with ' ' separator, lists/tuples recursively;
- numpy scalars (the pandas fetch path) unwrap via .item() first; a
  pandas NaT has no .item() and renders via str().
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math


def norm(v, fmt: str = "%.9g") -> str:
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        # np.datetime64 with ns unit .item()s to a raw int (epoch nanos),
        # which would hash as '1704067200000000000' instead of taking the
        # isoformat path below — downcast to us first so timestamps always
        # render as walls (ADVICE r9: latent asymmetry; itertuples yields
        # pd.Timestamp today, but THE shared canonicalizer must not fork
        # on the unit of a numpy scalar that reaches it directly).
        import numpy as np

        if isinstance(v, np.datetime64):
            iv = v.item()  # D→date, s/ms/us→datetime, ns/finer→raw int
            v = v.astype("datetime64[us]").item() if isinstance(iv, int) else iv
        else:
            v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return fmt % v
    if isinstance(v, (dt.datetime, dt.date)):
        # ONE timestamp precision (microseconds) no matter which scalar
        # type carries the instant: the numpy branch above truncates
        # datetime64[ns] to us, but a pandas Timestamp (itertuples /
        # fetchdf path) renders nanoseconds via isoformat — the same
        # sub-us instant would hash differently per fetch path
        # (ADVICE r10). nanosecond is an int 0-999 on a real Timestamp
        # and float('nan') on NaT (which must keep rendering 'NaT').
        ns = getattr(v, "nanosecond", 0)
        if isinstance(ns, int) and ns:
            v = v.replace(nanosecond=0)
        return v.isoformat().replace("T", " ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x, fmt) for x in v) + "]"
    return str(v)


def lines_of(cols, rows, fmt: str = "%.9g") -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm(r[i], fmt) for i in order) for r in rows)


def vhash(lines, n: int = 16) -> str:
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:n]
