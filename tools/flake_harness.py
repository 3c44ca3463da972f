"""N-run determinism (flake) harness over the full driver contract.

CORRECTNESS_r06 went red on 2 of 50 keys in the driver's run while four
judge re-runs stayed green — a flake, which the engine owns (VERDICT r6
§What's wrong 1). This harness catches that class in the act: it runs
tools/driver_sim.py N times as FRESH subprocesses, sweeping the session
knobs the result must be invariant to — core count, shuffle partition
count (different partitioning => different double-summation orders,
AQE decisions, window tie layouts), and session timezone — and asserts
per-key that

  (a) the Spark value-hash is IDENTICAL across every run/config, and
  (b) it equals the DuckDB oracle hash in every run (for oracle keys).

Each run persists its per-key linesets (gzip JSON), so an unstable key
is diffed POST-HOC without a rerun: the first differing run pair's
spark-only/other-only lines land in DIVERGENCE_XRUN_{key}.json, and any
in-run spark-vs-oracle mismatch is already persisted by driver_sim as
DIVERGENCE_{key}.json. A summary (configs, per-key hash sets, verdict)
is written to FLAKE.json (commit as FLAKE_r{N}.json).

Round 8 adds the VERSION-SKEW axis (VERDICT r7 §Next 2): the r6/r7
driver-red keys diverged only under a different duckdb/libm build —
a failure class run-shape sweeps can never reach. Every run now records
its engine versions (tools/engineversions.py) into FLAKE.json, and if
``SPARK_GRAFT_SKEW_PYTHON`` names an alternate python interpreter
(a venv with a DIFFERENT duckdb wheel), one extra sweep config runs the
full sim under it and its hashes join the same per-key equality
assertion. This container is offline with a single duckdb wheel baked
in, so by default the leg records itself as env-gated-skipped — the
harness SUPPORT is in place for any environment that has two wheels.
(Round 8 also removed every query-time libm call from the hashed
surface — tests/test_libm_invariant.py — so the class this leg hunts
is additionally excluded by construction.)

Usage:
    python tools/flake_harness.py            # default 5-config sweep
    SPARK_GRAFT_FLAKE_RUNS=3 python tools/flake_harness.py   # first 3
    SPARK_GRAFT_SKEW_PYTHON=/path/venv/bin/python \\
        python tools/flake_harness.py        # + duckdb version-skew leg
"""
from __future__ import annotations

import gzip
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
# `python tools/flake_harness.py` puts only tools/ on sys.path — the
# repo root must be added for `tools.*` imports (code-review r9: the
# unresolvable import crashed the sweep before the round-9 legs ran)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

#: (cores, shuffle partitions, session timezone, PROCESS timezone,
#: fixture encoding): the judge's four reproduction configs (VERDICT
#: r6) plus a low-core prime-partition eastern-timezone combination and
#: a PROCESS-zone run (TZ env var — PySpark renders TimestampType at
#: collect via python's local zone, a channel the session zone doesn't
#: cover; batch NTZ results and the runners' walls_out boundary are
#: immune, this run proves it). Each run permutes task scheduling,
#: partition boundaries, and both rendering zones independently.
#:
#: Round 9 adds the FIXTURE-ENCODING axis (VERDICT r8 §Next 3): the
#: round-2 driver error trace proves the driver's parquet typing of
#: events.ts differs from local, so two legs run the sim against
#: tools/fixture_recode.py rewrites of sf0.01 — events.ts as an
#: INSTANT (TIMESTAMP MICROS isAdjustedToUTC=1; DuckDB reads
#: TIMESTAMPTZ and renders in the process zone) and as INT64 NANOS
#: (the encoding earlier testdata rounds shipped) — both under a
#: non-UTC process TZ. Every value hash must be invariant to them.
#: Round 9 also adds the FETCH-PATH axis: the round-red keys turned out
#: to diverge only through CLIENT-SIDE type conversion (duckdb HUGEINT →
#: pandas float64, "150.0" vs "150"; tests/test_oracle_types.py), which
#: fetchall()-based sweeps are structurally blind to. One leg fetches
#: both engines through the dataframe path (toPandas()/fetchdf()).
#: Its spark hashes are compared against the ORACLE within the run but
#: excluded from the cross-run rows-fetch hash set (int-with-NULL
#: columns legitimately render 5.0/NaN under pandas on BOTH sides).
CONFIGS = [
    # (cores, parts, session tz, process TZ, fixture encoding, fetch)
    ("8", "16", "UTC", None, None, "rows"),      # the driver's own shape
    ("32", "200", "UTC", None, None, "rows"),    # wide + default-ish parts
    ("8", "7", "America/New_York", None, None, "rows"),  # odd primes, non-UTC
    ("4", "16", "Asia/Kolkata", None, None, "rows"),  # half-hour offset
    ("16", "64", "UTC", "America/New_York", None, "rows"),  # PROCESS zone
    ("8", "16", "UTC", "America/New_York", "instant_us", "rows"),  # TZ fixture
    ("8", "16", "UTC", "America/New_York", "nanos", "rows"),  # ns fixture
    ("8", "16", "UTC", None, None, "pandas"),    # dataframe fetch path
]


def main() -> int:
    n = int(os.environ.get("SPARK_GRAFT_FLAKE_RUNS", len(CONFIGS)))
    configs = [list(c) + [sys.executable] for c in CONFIGS[:n]]
    # version-skew leg: the driver's own run shape under an alternate
    # interpreter whose venv pins a DIFFERENT duckdb wheel
    skew_py = os.environ.get("SPARK_GRAFT_SKEW_PYTHON")
    if skew_py:
        configs.append(["8", "16", "UTC", None, None, "rows", skew_py])
    outdir = os.environ.get("SPARK_GRAFT_FLAKE_DIR", "/tmp/spark_graft_flake")
    os.makedirs(outdir, exist_ok=True)
    runs = []
    for i, (cores, parts, tz, proc_tz, enc, fetch, py) in enumerate(configs):
        env = dict(os.environ)
        env.update(
            SPARK_GRAFT_SIM_CORES=cores,
            SPARK_GRAFT_SIM_PARTS=parts,
            SPARK_GRAFT_SIM_TZ=tz,
            SPARK_GRAFT_SIM_FETCH=fetch,
            SPARK_GRAFT_SIM_OUT=f"{outdir}/run{i}.json",
            SPARK_GRAFT_SIM_LINES=f"{outdir}/run{i}.lines.json.gz",
            SPARK_GRAFT_SIM_DIVDIR=outdir,
        )
        if proc_tz is not None:
            env["TZ"] = proc_tz
        if enc is not None:
            # fixture-encoding leg: rewrite events.ts typing, same values
            from tools.fixture_recode import recode_sf_dir

            src = os.environ.get(
                "SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01"
            )
            env["SPARK_GRAFT_SIM_SF"] = recode_sf_dir(
                src, f"{outdir}/fixture_{enc}", enc
            )
        # outdir persists across sweeps: drop any prior run{i} artifacts
        # BEFORE launching, so a sim that crashes pre-write cannot make
        # this run silently inherit a stale versions block / lineset
        # from a previous code revision (code-review r8 finding)
        for stale in (f"{outdir}/run{i}.json", f"{outdir}/run{i}.lines.json.gz"):
            try:
                os.remove(stale)
            except FileNotFoundError:
                pass
        t0 = time.time()
        proc = subprocess.run(
            [py, f"{REPO}/tools/driver_sim.py"],
            env=env, capture_output=True, text=True,
        )
        dur = round(time.time() - t0, 1)
        ok = proc.returncode == 0
        versions = {}
        try:
            versions = json.load(open(f"{outdir}/run{i}.json")).get(
                "versions", {}
            )
        except Exception:
            pass
        print(f"run {i} local[{cores}] parts={parts} tz={tz}"
              f" TZ={proc_tz or '-'} enc={enc or '-'} fetch={fetch}"
              f" duckdb={versions.get('duckdb', '?')}: "
              f"{'green' if ok else 'RED'} in {dur}s", flush=True)
        if not ok:
            tail = "\n".join(proc.stdout.splitlines()[-15:])
            print(tail)
        runs.append({"config": {"cores": cores, "parts": parts, "tz": tz,
                                "proc_tz": proc_tz,
                                "fixture_encoding": enc,
                                "fetch": fetch,
                                "skew_interpreter": py != sys.executable},
                     "versions": versions,
                     "green": ok, "seconds": dur})

    duckdbs = sorted({r["versions"].get("duckdb") for r in runs} - {None})
    version_skew = (
        {"status": "active", "duckdb_versions": duckdbs}
        if skew_py
        else {
            "status": "env-gated-skipped",
            "reason": (
                "single duckdb wheel baked in; set SPARK_GRAFT_SKEW_PYTHON "
                "to a venv python with a different duckdb to activate. "
                "Round-9 acquisition attempts (VERDICT r8 §Next 5), all "
                "negative: `pip cache list` → 'No locally built wheels "
                "cached'; filesystem sweep `find / -name 'duckdb*.whl' "
                "-o -name 'duckdb*.tar.gz'` → none; `pip download "
                "duckdb==1.1.3 --no-deps` → 'from versions: none' (index "
                "unreachable/filtered); no duckdb sdist on disk to build "
                "from. NOTE the round-9 HUGEINT finding "
                "(tests/test_oracle_types.py) identified the actual red-key "
                "channel as CLIENT-SIDE fetch typing, not engine version — "
                "the fetch-path leg below now covers that class directly."
            ),
            "duckdb_versions": duckdbs,
            "mitigation": (
                "hashed surface contains no query-time libm call "
                "(tests/test_libm_invariant.py), excluding the "
                "version-divergence class by construction"
            ),
        }
    )

    # cross-run stability: every key's spark hash must be one value
    # across the ROWS-fetch runs (the pandas-fetch leg legitimately
    # renders int-with-NULL columns as 5.0/NaN on both sides, so its
    # hashes are a different — internally consistent — canonical form:
    # it participates only through its own within-run oracle match).
    # A run that crashed before writing its artifact contributes
    # nothing here (its file was pre-deleted, never stale) — the
    # verdict is already red via runs[i]["green"].
    per_run, run_fetch, run_idx = [], [], []
    for i in range(len(configs)):
        try:
            art = json.load(open(f"{outdir}/run{i}.json"))
        except FileNotFoundError:
            continue
        # driver_sim now flushes the artifact after EVERY key (crash
        # durability), so a crashed run leaves a loadable PARTIAL file:
        # only artifacts whose final write stamped complete=true join
        # the cross-run hash comparison — otherwise every key the run
        # never reached would read as hash None and flood `unstable`
        # with phantoms (code-review r10). The crash itself is already
        # red via runs[i]["green"].
        if "complete" not in art:
            # pre-r10 artifact (or a foreign producer) from before the
            # per-key-flush change: it was only ever written whole, so
            # treat it as complete rather than silently excluding it —
            # an old outdir re-analyzed must not yield an empty
            # comparison that still prints all_stable (ADVICE r10)
            print(f"run {i}: pre-complete-flag artifact — including "
                  f"(legacy end-only write implies complete)")
        elif not art["complete"]:
            print(f"run {i}: partial artifact (crashed run) — "
                  f"excluded from cross-run comparison")
            continue
        per_run.append(art["results"])
        run_fetch.append(configs[i][5])
        run_idx.append(i)
    if not per_run:
        # every artifact missing or partial: the cross-run comparison
        # has NO evidence — fail loudly instead of emitting an
        # all_stable verdict over an empty key set (ADVICE r10)
        raise SystemExit(
            "flake_harness: no complete run artifacts to compare — "
            "all runs crashed pre-completion or the outdir is empty"
        )
    if "rows" not in run_fetch:
        # the per-key stability assertion compares ROWS-fetch hashes
        # only (the pandas leg is a different canonical form); with
        # zero surviving rows-fetch runs every key would read as
        # unstable-with-no-hashes — a phantom flood, not evidence
        # (code-review r11)
        raise SystemExit(
            "flake_harness: no complete ROWS-fetch run artifacts — "
            "cross-run hash comparison has no evidence base"
        )
    keys = sorted(set().union(*per_run))
    summary, unstable = {}, []
    for k in keys:
        # (config index, hash) pairs — keyed by index, NOT positional:
        # if a rows run crashed pre-write its artifact is absent, and a
        # bare hash list would silently shift alignment against the
        # config enumeration during post-hoc triage (ADVICE r9)
        hashes_by_run = [
            (i, r.get(k, {}).get("spark_hash"))
            for r, f, i in zip(per_run, run_fetch, run_idx) if f == "rows"
        ]
        hashes = [h for _, h in hashes_by_run]
        oracle_ok = all(
            r.get(k, {}).get("oracle_hash") is None
            or r.get(k, {}).get("oracle_hash") == r.get(k, {}).get("spark_hash")
            for r in per_run
        )
        stable = len(set(hashes)) == 1 and hashes[0] is not None and oracle_ok
        summary[k] = {"spark_hashes": sorted(set(map(str, hashes))),
                      "oracle_match_every_run": oracle_ok,
                      "stable": stable}
        if not stable:
            unstable.append(k)
            # diff ROWS-fetch runs only: the pandas leg's canonical form
            # legitimately differs (5.0/NaN vs 5/NULL) and would bury
            # the real cross-run signal (code-review r9)
            _diff_runs(outdir, k, hashes_by_run)

    # fixture-encoding axis verdict (round 9): the legs reading recoded
    # events.ts join the same per-key hash-equality assertion above;
    # this block just makes the axis visible in the artifact.
    enc_runs = [r for r in runs if r["config"].get("fixture_encoding")]
    fixture_encoding = {
        "status": "active" if enc_runs else "not-run (SPARK_GRAFT_FLAKE_RUNS truncated the sweep)",
        "encodings": sorted(
            {r["config"]["fixture_encoding"] for r in enc_runs}
        ),
        "all_green": bool(enc_runs) and all(r["green"] for r in enc_runs),
    }

    verdict = {"runs": runs, "n_keys": len(keys), "unstable": unstable,
               "all_stable": not unstable and all(r["green"] for r in runs),
               "version_skew": version_skew,
               "fixture_encoding": fixture_encoding,
               "keys": summary}
    with open(f"{REPO}/FLAKE.json", "w") as fh:
        json.dump(verdict, fh, indent=1)
    print(json.dumps({"all_stable": verdict["all_stable"],
                      "unstable": unstable}))
    return 0 if verdict["all_stable"] else 1


def _diff_runs(outdir: str, key: str, hashes_by_run: list) -> None:
    """Persist the first differing ROWS-fetch run pair's linesets for
    `key`. ``hashes_by_run`` is a list of (config index, spark hash)
    pairs for the rows-fetch runs whose artifacts loaded — keyed by
    index so a crashed run can't shift which hash is attributed to
    which config (ADVICE r9)."""
    base = None
    for i, _h in hashes_by_run:
        try:
            lines = json.load(
                gzip.open(f"{outdir}/run{i}.lines.json.gz", "rt")
            ).get(key)
        except FileNotFoundError:  # run i crashed pre-write
            continue
        if lines is None:
            continue
        if base is None:
            base = (i, lines)
            continue
        if lines != base[1]:
            a, b = set(base[1]), set(lines)
            path = f"{REPO}/DIVERGENCE_XRUN_{key}.json"
            with open(path, "w") as fh:
                json.dump({"key": key, "run_a": base[0], "run_b": i,
                           "hashes_by_run": hashes_by_run,
                           "only_run_a": sorted(a - b)[:200],
                           "only_run_b": sorted(b - a)[:200]}, fh, indent=1)
            print(f"  {key}: cross-run divergence persisted to {path}")
            return
    print(f"  {key}: hash instability came from spark-vs-oracle, see "
          f"{outdir}/DIVERGENCE_{key}.json")


if __name__ == "__main__":
    sys.exit(main())
