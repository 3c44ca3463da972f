"""Driver-environment diagnostic emitted through the bench stdout tail
(round 9 centerpiece; VERDICT r8 §Next 1).

``bench.py`` is the ONE piece of this repo whose stdout runs inside the
driver's own container and comes back committed (``BENCH_r{N}.json``
``tail``). ``CORRECTNESS_r{N}`` has been hash-red on the SAME two keys
(``distinct_users``, ``doc_profile``) for three rounds while every
local reproduction — 5-config sweeps, three SFs, zone/process-TZ
permutations, a 17-significant-digit exact-rendering comparison — stays
green, and the driver's own r8 versions block disproves version skew.
Only data FROM the driver environment can localize the divergence, so
this module re-runs the two red keys at sf0.01 against a DuckDB oracle
IN-PROCESS and prints, in a few ultra-compact lines:

- ``DG C``: per-column two-side hashes + a sample differing value for
  each mismatching column (localizes the exact column/member);
- ``DG V``: per-variant column match bits for mismatching variants;
- ``DG E``: an environment fingerprint — the parquet physical/logical
  typing of ``events.ts`` (the round-2 error trace proves fixture
  encodings differ between environments), DuckDB's view typing and
  ``TimeZone``, the JVM default zone and locale, and the
  TZ/LANG/LC_ALL/PYTHONHASHSEED process env;
- ``DG K``: per key, full-frame value hashes of BOTH sides (the same
  canonicalization as tools/driver_sim.py, so they compare directly
  against the committed FLAKE/DIVERGENCE artifacts), a
  17-significant-digit match flag, per-variant match bits, and
  per-column match bits.

CALIBRATION: the driver's tail capture is 2000 characters and the
compact bench line consumes ~1500, so the green-path budget here is
~400 chars (3-4 short lines). Lines are ordered least- to
most-critical (C/V detail, then E, then K) so truncation eats detail
before it eats the summary. The decisive fork the K lines give us even
when everything here matches: if DG says spark==oracle in the driver's
env while CORRECTNESS_r09 is still red, the divergence is in the
HARNESS's own duckdb/canonicalizer, not in anything this repo computes
— and if the spark-side hash differs from the committed local one
(ad6b9578…/9badc4e1…, FLAKE_r08), the Spark plan itself is
env-sensitive there.
"""

from __future__ import annotations

import json
import os
import re
import sys

#: the driver-red keys under observation
DIAG_KEYS = ("distinct_users", "doc_profile")
#: cap on per-column mismatch detail lines per key
MAX_DETAIL = 4

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


from tools.canon import norm as _norm  # noqa: E402
from tools.canon import vhash as _h  # noqa: E402


def _colhash(vals, fmt="%.9g", n=8) -> str:
    return _h(sorted(_norm(v, fmt) for v in vals), n)


def _fingerprint(spark, sf_dir: str, con) -> str:
    """One compact JSON env fingerprint; every probe fails soft."""
    fp: dict[str, str | None] = {}
    try:
        import pyarrow.parquet as pq

        sch = pq.read_metadata(f"{sf_dir}/events.parquet").schema
        col = next(
            sch.column(i) for i in range(len(sch)) if sch.column(i).name == "ts"
        )
        lt = str(col.logical_type)
        adj = re.search(r"isAdjustedToUTC=(\w+)", lt)
        unit = re.search(r"timeUnit=(\w+)", lt)
        fp["pq"] = ":".join(
            [
                str(col.physical_type),
                lt.split("(")[0],
                f"adj={adj.group(1)[0] if adj else '?'}",
                unit.group(1)[:5] if unit else "?",
            ]
        )
    except Exception as exc:  # noqa: BLE001
        fp["pq"] = f"ERR:{type(exc).__name__}"
    try:
        fp["ddb"] = con.execute(
            "SELECT typeof(ts) FROM events LIMIT 1"
        ).fetchone()[0]
        fp["dtz"] = con.execute(
            "SELECT current_setting('TimeZone')"
        ).fetchone()[0]
    except Exception as exc:  # noqa: BLE001
        fp["ddb"] = f"ERR:{type(exc).__name__}"
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        fp["spk"] = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .schema["ts"].dataType.simpleString()
        )
    except Exception as exc:  # noqa: BLE001
        fp["spk"] = f"ERR:{type(exc).__name__}"
    try:
        jvm = spark.sparkContext._jvm
        fp["jtz"] = jvm.java.util.TimeZone.getDefault().getID()
        fp["jlc"] = str(jvm.java.util.Locale.getDefault().toString())
    except Exception as exc:  # noqa: BLE001
        fp["jtz"] = f"ERR:{type(exc).__name__}"
    fp["stz"] = spark.conf.get("spark.sql.session.timeZone", None)
    for k in ("TZ", "LANG", "LC_ALL", "PYTHONHASHSEED"):
        fp[k] = os.environ.get(k)
    return json.dumps(fp, separators=(",", ":"))


def _pandas_match(sdf, con, sql) -> int:
    """1 if the two sides also agree when both are fetched through the
    DATAFRAME path (spark .toPandas() / duckdb .fetchdf()) — the
    client-side typing channel (duckdb HUGEINT → float64) behind the
    r6–r8 driver reds; -1 if the probe itself fails."""
    try:
        sp = sdf.toPandas()
        dp = con.execute(sql).fetchdf()
        sl = _pd_lines(sp)
        dl = _pd_lines(dp)
        return int(sl == dl)
    except Exception:  # noqa: BLE001
        return -1


def _pd_lines(pdf) -> list[str]:
    order = sorted(range(len(pdf.columns)), key=lambda i: pdf.columns[i])
    return sorted(
        "|".join(_norm(r[i]) for i in order)
        for r in pdf.itertuples(index=False, name=None)
    )


def _key_lines(name, sdf, cur, pm: int | None = None) -> list[str]:
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    cols = sorted(scols)
    if sorted(dcols) != cols:
        return [f"DG K {name} SCHEMA s={sorted(scols)} o={sorted(dcols)}"[:160]]

    def lines(rows, order, fmt="%.9g"):
        return sorted(
            "|".join(_norm(r[i], fmt) for i in order) for r in rows
        )

    sh, oh = _h(lines(srows, so)), _h(lines(drows, do))
    m17 = int(lines(srows, so, "%.17g") == lines(drows, do, "%.17g"))

    cb, bad_cols = "", []
    for ci, c in enumerate(cols):
        ok = _colhash(r[so[ci]] for r in srows) == _colhash(
            r[do[ci]] for r in drows
        )
        cb += "1" if ok else "0"
        if not ok:
            bad_cols.append((ci, c))

    out, vb = [], ""
    vi = next(
        (i for i, c in enumerate(cols) if c in ("variant", "algo", "method")),
        None,
    )
    if vi is not None:
        svar: dict[str, list] = {}
        dvar: dict[str, list] = {}
        for r in srows:
            svar.setdefault(str(r[so[vi]]), []).append(r)
        for r in drows:
            dvar.setdefault(str(r[do[vi]]), []).append(r)
        for v in sorted(set(svar) | set(dvar)):
            ok = _h(lines(svar.get(v, []), so)) == _h(lines(dvar.get(v, []), do))
            vb += "1" if ok else "0"
            if not ok:
                bits = "".join(
                    "1"
                    if _colhash(r[so[ci]] for r in svar.get(v, []))
                    == _colhash(r[do[ci]] for r in dvar.get(v, []))
                    else "0"
                    for ci in range(len(cols))
                )
                out.append(f"DG V {name} v={v} cb={bits}")
    for ci, c in bad_cols[:MAX_DETAIL]:
        sv = sorted(_norm(r[so[ci]]) for r in srows)
        ov = sorted(_norm(r[do[ci]]) for r in drows)
        pair = next(
            ((a, b) for a, b in zip(sv, ov) if a != b),
            (sv and sv[-1] or "", ov and ov[-1] or ""),
        )
        out.append(
            f"DG C {name} c={c} s={_h(sv, 8)} o={_h(ov, 8)} "
            f"sx={pair[0][:16]} ox={pair[1][:16]}"
        )
    out.append(
        f"DG K {name} n={len(srows)}/{len(drows)} s={sh} o={oh} m17={m17}"
        + (f" mp={pm}" if pm is not None else "")
        + (f" vb={vb}" if vb else "")
        + f" cb={cb}"
    )
    return out


def diag_lines(spark, sf_dir: str) -> list[str]:
    """All diagnostic lines, least-critical first (module docstring).
    Every failure is caught and reported as its own DG ERR line — the
    bench timing loop must never be at risk from this probe."""
    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    diag_sf = re.sub(r"sf[0-9.]+", "sf0.01", sf_dir)
    if not os.path.exists(f"{diag_sf}/events.parquet"):
        diag_sf = sf_dir
    con = duckdb.connect()
    for t in _TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{diag_sf}/{t}.parquet')"
            )
        except Exception:  # noqa: BLE001 — fingerprint still useful
            pass
    out: list[str] = []
    detail: list[str] = []
    summary: list[str] = []
    qmap, omap = entry.queries(), entry.oracle_sql()
    for name in DIAG_KEYS:
        try:
            # localCheckpoint: the Spark plan computes ONCE; the two
            # fetch paths (collect vs toPandas) then read the
            # materialized partitions instead of re-running the job
            # (code-review r9). The duckdb oracle still executes per
            # fetch path — a cursor can only be consumed once, and the
            # sf0.01 oracles are 1-2 s.
            sdf = qmap[name](spark, diag_sf).localCheckpoint(eager=True)
            pm = _pandas_match(sdf, con, omap[name])
            kl = _key_lines(name, sdf, con.execute(omap[name]), pm)
            detail.extend(kl[:-1])
            summary.append(kl[-1])
        except Exception as exc:  # noqa: BLE001
            summary.append(
                f"DG ERR {name} {type(exc).__name__}: {exc}"[:140]
            )
    out.extend(detail)
    try:
        out.append("DG E " + _fingerprint(spark, diag_sf, con))
    except Exception as exc:  # noqa: BLE001
        out.append(f"DG ERR fingerprint {type(exc).__name__}: {exc}"[:140])
    out.extend(summary)
    con.close()
    return out
