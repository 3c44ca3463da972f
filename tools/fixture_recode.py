"""Rewrite a scale-factor fixture directory with ``events.ts`` re-typed
(round 9; VERDICT r8 §Next 3).

The round-2 driver error trace proves the driver's parquet fixture
encodings differ from the local ones (``events.ts`` arrived as parquet
TIMESTAMP where the then-local fixture was INT64 nanos), yet every
local sweep keeps reading the one local encoding — so the one condition
PROVEN to differ between environments was never exercised. This tool
produces sibling fixture dirs whose only difference is the physical/
logical typing of ``events.ts``:

- ``instant_us``  TIMESTAMP(MICROS, isAdjustedToUTC=1): DuckDB reads
                  TIMESTAMPTZ (renders in the process TimeZone — the
                  suspected red channel), Spark reads TimestampType;
- ``nanos``       TIMESTAMP(NANOS, isAdjustedToUTC=0): DuckDB reads
                  TIMESTAMP_NS, Spark needs the nanosAsLong fallback —
                  the encoding earlier testdata rounds actually shipped;
- ``micros_ntz``  TIMESTAMP(MICROS, isAdjustedToUTC=0): the current
                  local encoding (identity rewrite, control leg).

The stored INSTANT is identical in all three (the local naive walls are
UTC walls by the catalog contract), so every query result — and every
value hash — must be invariant across them. tools/flake_harness.py runs
the driver sim against these dirs under a non-UTC process TZ.

All other tables are symlinked, not copied.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ENCODINGS = ("instant_us", "nanos", "micros_ntz")

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_naive_us(ts: pa.ChunkedArray) -> pa.ChunkedArray:
    """Normalize any fixture typing to naive micros holding the UTC wall."""
    t = ts.type
    if not pa.types.is_timestamp(t):
        # INT64 nanos read as plain ints (legacy encodings)
        return ts.cast(pa.int64()).cast(pa.timestamp("ns")).cast(
            pa.timestamp("us")
        )
    if t.tz is not None:
        # instant: the UTC wall is the instant rendered in UTC
        ts = pc.local_timestamp(ts.cast(pa.timestamp("us", tz="UTC")))
    return ts.cast(pa.timestamp("us"))


def recode_sf_dir(src: str, dst: str, encoding: str) -> str:
    """Build ``dst`` as ``src`` with events.ts re-typed; returns dst."""
    if encoding not in ENCODINGS:
        raise ValueError(f"unknown encoding {encoding!r}; have {ENCODINGS}")
    os.makedirs(dst, exist_ok=True)
    for t in _TABLES:
        link = os.path.join(dst, f"{t}.parquet")
        if t != "events":
            # lexists + remove, not exists-guarded create: a dangling
            # symlink left by a moved source dir makes exists() False
            # while symlink() still raises FileExistsError (code-review
            # r9) — and re-pointing keeps a persisted recode dir honest
            if os.path.lexists(link):
                os.remove(link)
            os.symlink(os.path.join(os.path.abspath(src), f"{t}.parquet"), link)
            continue
        tbl = pq.read_table(os.path.join(src, "events.parquet"))
        naive = _to_naive_us(tbl["ts"])
        if encoding == "instant_us":
            new = pc.assume_timezone(naive, "UTC")
        elif encoding == "nanos":
            new = naive.cast(pa.timestamp("ns"))
        else:
            new = naive
        tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", new)
        if os.path.lexists(link):
            os.remove(link)
        # parquet format version 2.6 is required to store NANOS without
        # pyarrow silently coercing to micros
        pq.write_table(tbl, link, version="2.6")
    return dst


if __name__ == "__main__":
    import sys

    src, dst, enc = sys.argv[1:4]
    print(recode_sf_dir(src, dst, enc))
