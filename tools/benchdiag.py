"""Driver-environment diagnostic emitted through the bench stdout tail
(round 9 centerpiece, VERDICT r8 §Next 1; generalized round 10,
VERDICT r9 §Next 1).

``bench.py`` is the ONE piece of this repo whose stdout runs inside the
driver's own container and comes back committed (``BENCH_r{N}.json``
``tail``). This channel is what cracked the three-round r6-r8 driver-red
mystery (duckdb HUGEINT → pandas float64 on the harness's fetch path),
so it stays live: each round it re-runs a small ROTATING set of
registered keys at sf0.01 against a DuckDB oracle IN-PROCESS, inside
the driver's own container, and prints, in a few ultra-compact lines:

- ``DG C``: per-column two-side hashes + a sample differing value for
  each mismatching column (localizes the exact column/member);
- ``DG V``: per-variant column match bits for mismatching variants;
- ``DG K``: per key, full-frame value hashes of BOTH sides (the same
  canonicalization as tools/driver_sim.py, so they compare directly
  against the committed FLAKE/DIVERGENCE artifacts), a
  17-significant-digit match flag, a pandas-fetch-path match flag,
  per-variant match bits, and per-column match bits;
- ``DG E``: an environment fingerprint — the parquet physical/logical
  typing of ``events.ts`` (the round-2 error trace proves fixture
  encodings differ between environments), DuckDB's view typing and
  ``TimeZone``, the JVM default zone and locale, and the
  TZ/LANG/LC_ALL/PYTHONHASHSEED process env.

KEY SELECTION: ``SPARK_GRAFT_DIAG_KEYS`` (comma-separated) overrides;
the default rotates ``DIAG_KEYS_N`` consecutive keys through the sorted
registry by round number (derived from the committed ``BENCH_r{N}``
artifacts), so over rounds the whole contract passes through the
driver-side observability channel instead of it forever watching the
two solved r9 cases.

CALIBRATION: the driver's tail capture is 2000 characters and the
compact bench line consumes ~1500. Lines are ordered least- to
most-critical (C/V detail, then K summaries, then E LAST): truncation
eats from the FRONT of the tail, so detail dies first and the env
fingerprint — the one thing only this channel can exfiltrate — dies
last (ADVICE r9: the previous detail→E→K order could truncate E out on
the green path). bench.py additionally trims the printed lines to the
measured byte budget (2000 minus the actual compact-line length) so the
compact line always survives whole.
"""

from __future__ import annotations

import json
import os
import re
import sys

#: rotation width: how many registry keys each round's tail observes
DIAG_KEYS_N = 3
#: cap on per-column mismatch detail lines per key
MAX_DETAIL = 4

#: Round-scoped WATCH keys appended after the rotation window (VERDICT
#: r10 §Next 6): a key whose driver-bench timing wobbled gets one round
#: of targeted in-container observation (its DG K line carries t=<sec>)
#: without disturbing the rotation's coverage walk. Prune entries once
#: their round has passed.
DIAG_WATCH: dict[int, tuple[str, ...]] = {
    # r10 driver single-run showed 18.3→23.6 s with a flat local minimum
    # (judged host noise) — carry its in-container timing/hash evidence
    11: ("stream_batch_equiv",),
}


def trim_to_budget(lines: list[str], budget: int) -> list[str]:
    """Greedily keep lines from the END of ``lines`` (most-critical
    last, module docstring) whose printed size (line + newline) fits
    ``budget`` BYTES — measured with len(encode()), since DG detail
    lines can carry sampled non-ASCII data values and a char count
    would under-bill them past the driver's byte-based capture
    (ADVICE r10) — SKIPPING any line too big for the remaining budget
    rather than stopping: a single oversized trailing line (e.g. the
    DG E fingerprint on a red round whose compact line grew a 'failed'
    field) must not evict every shorter line that would still fit
    (code-review r10). The driver's tail capture keeps the END of
    stdout, so this is uncontrolled front-truncation made line-aligned,
    guaranteed to leave the compact bench line intact (ADVICE r9)."""
    keep: list[str] = []
    total = 0
    for ln in reversed(lines):
        nbytes = len(ln.encode()) + 1
        if total + nbytes > budget:
            continue
        total += nbytes
        keep.append(ln)
    return keep[::-1]


def _round_number() -> int:
    """Best-effort current round: 1 + the highest committed
    ``BENCH_r{N}.json`` (the driver commits round N's bench artifact at
    the END of round N, so while round N's bench RUNS the repo holds
    r1..r{N-1}). Falls back to 1 in a bare checkout."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for f in os.listdir(repo)
        if (m := re.match(r"BENCH_r(\d+)\.json$", f))
    ]
    return max(rounds, default=0) + 1


def diag_keys(all_keys) -> list[str]:
    """The keys this round's bench tail observes: the env override if
    set, else DIAG_KEYS_N consecutive keys of the sorted registry
    starting at a round-rotated offset (wrapping), plus this round's
    DIAG_WATCH keys appended LAST (deduped) — last so their summary
    lines sit nearest the tail end and survive trimming longest."""
    env = os.environ.get("SPARK_GRAFT_DIAG_KEYS")
    if env:
        return [k for k in (s.strip() for s in env.split(",")) if k]
    keys = sorted(all_keys)
    if not keys:
        return []
    rnd = _round_number()
    start = (rnd * DIAG_KEYS_N) % len(keys)
    picked = [
        keys[(start + i) % len(keys)]
        for i in range(min(DIAG_KEYS_N, len(keys)))
    ]
    picked += [
        k for k in DIAG_WATCH.get(rnd, ()) if k in keys and k not in picked
    ]
    return picked

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
        # set-and-RESTORE: the probe must not leave the shared session
        # reading nanos-typed parquet timestamps as bigint for any later
        # caller (ADVICE r9)
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            fp["spk"] = (
                spark.read.parquet(f"{sf_dir}/events.parquet")
                .schema["ts"].dataType.simpleString()
            )
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
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


def _key_lines(
    name, sdf, cur, pm: int | None = None, sec: float | None = None
) -> list[str]:
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
        + (f" t={sec}" if sec is not None else "")
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
    for name in diag_keys(qmap):
        if name not in qmap:
            summary.append(f"DG K {name} UNKNOWN-KEY")
            continue
        if name not in omap:
            # non-SQL-expressible key rotated in: rows-only observation
            try:
                n = qmap[name](spark, diag_sf).count()
                summary.append(f"DG K {name} rows-only n={n}")
            except Exception as exc:  # noqa: BLE001
                summary.append(
                    f"DG ERR {name} {type(exc).__name__}: {exc}"[:140]
                )
            continue
        try:
            # localCheckpoint: the Spark plan computes ONCE; the two
            # fetch paths (collect vs toPandas) then read the
            # materialized partitions instead of re-running the job
            # (code-review r9). The duckdb oracle still executes per
            # fetch path — a cursor can only be consumed once, and the
            # sf0.01 oracles are 1-2 s. The eager-compute seconds ride
            # the DG K line (t=) as in-container timing evidence for
            # DIAG_WATCH keys whose driver-bench wall-clock wobbled.
            import time

            t0 = time.perf_counter()
            sdf = qmap[name](spark, diag_sf).localCheckpoint(eager=True)
            sec = round(time.perf_counter() - t0, 1)
            pm = _pandas_match(sdf, con, omap[name])
            kl = _key_lines(name, sdf, con.execute(omap[name]), pm, sec)
            detail.extend(kl[:-1])
            summary.append(kl[-1])
        except Exception as exc:  # noqa: BLE001
            summary.append(
                f"DG ERR {name} {type(exc).__name__}: {exc}"[:140]
            )
    # least- to most-critical: detail, K summaries, env fingerprint LAST
    # (tail truncation eats from the front; module docstring CALIBRATION)
    out.extend(detail)
    out.extend(summary)
    try:
        out.append("DG E " + _fingerprint(spark, diag_sf, con))
    except Exception as exc:  # noqa: BLE001
        out.append(f"DG ERR fingerprint {type(exc).__name__}: {exc}"[:140])
    con.close()
    return out
