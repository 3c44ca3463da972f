"""Full-contract stress at sf1 (VERDICT r9 §Next 4).

The per-loop sf1 stress (tools/stress_sf1.py, 15 ops) proves the
iterative/stateful paths hold at 10× bench scale; this tool extends the
evidence to the ENTIRE driver contract: it materializes the 10× replica
(events scaled too) and runs tools/driver_sim.py against it — every
registered key executes at sf1, value-hash-checked against its DuckDB
oracle wherever the oracle itself completes at that scale, rows/schema
otherwise. This is the cheapest full-scale evidence available in this
sandbox: the oracle recomputes from the SAME replica parquet, so a
green hash is engine/oracle parity AT sf1, not a fixture comparison.

Notes on scale semantics of the replica (tools/stress_sf1.py):
- documents keep IDENTICAL texts across replicas — every doc gains 9
  exact twins, making dedup/LSH keys maximally hot (the boilerplate
  shape of a real lake), so the dedup keys run their WORST honest case;
- events pack 10× rows into the same 30 days — per-day density, not
  day count, is what grows (the rollup/window blast-radius bound);
- region/nation/part stay fixture-sized (dimension tables).

Usage:
    python tools/stress_contract.py            # full 50-key contract
    SPARK_GRAFT_STRESS_KEYS=a,b python tools/stress_contract.py

Writes /tmp/stress_contract/contract.json and prints a per-key summary
(seconds for both engines + verdict) for SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUTDIR = "/tmp/stress_contract"


def main() -> int:
    from uw_hadoop_aglorithms_spark.session import get_spark
    from tools.stress_sf1 import build_replica_dir

    os.makedirs(OUTDIR, exist_ok=True)
    t0 = time.perf_counter()
    spark = get_spark("stress-contract-build")
    spark.sparkContext.setLogLevel("ERROR")
    d = build_replica_dir(spark, scale_events=True)
    spark.stop()
    print(f"sf1 replica (events scaled) built in "
          f"{time.perf_counter() - t0:.1f}s at {d}", flush=True)

    # stale-artifact guard: a sim that dies pre-write must not let this
    # tool report a previous run's results (round-10 first-run lesson)
    try:
        os.remove(f"{OUTDIR}/contract.json")
    except FileNotFoundError:
        pass
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SIM_SF=d,
        # bench-shaped session, not the sim's sf0.01 default: 10× data
        # wants the full local core count, more partitions, a real heap
        SPARK_GRAFT_SIM_CORES=os.environ.get("SPARK_GRAFT_STRESS_CORES", "32"),
        SPARK_GRAFT_SIM_PARTS=os.environ.get("SPARK_GRAFT_STRESS_PARTS", "64"),
        SPARK_GRAFT_SIM_DRIVER_MEM="24g",
        SPARK_GRAFT_SIM_OUT=f"{OUTDIR}/contract.json",
        SPARK_GRAFT_SIM_DIVDIR=OUTDIR,
        # the oracle side must fail FAST if it can't fit the sandbox —
        # the first full run ground 35+ min and filled the device with
        # DuckDB spill before dying
        SPARK_GRAFT_SIM_DUCK_LIMITS="memory_limit=48GB,temp=30GB",
        # round 11: neardup_pairs no longer force-skipped — the
        # content-class-reduced oracles (oracles._DCLS_CTE) run the
        # full suite at sf1 in ~20 s (measured; was >79 GB of DuckDB
        # temp spill in r10), value-hash-matching the engine's r10
        # sf1 output (ede05374f9642ace) byte-for-byte.
        SPARK_GRAFT_SIM_ROWS_ONLY=os.environ.get(
            "SPARK_GRAFT_STRESS_ROWS_ONLY", ""),
    )
    keys = os.environ.get("SPARK_GRAFT_STRESS_KEYS")
    if keys:
        env["SPARK_GRAFT_SIM_KEYS"] = keys
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, f"{REPO}/tools/driver_sim.py"], env=env
    )
    wall = round(time.perf_counter() - t0, 1)
    shutil.rmtree(d, ignore_errors=True)

    try:
        art = json.load(open(f"{OUTDIR}/contract.json"))
        res = art["results"]
    except Exception:
        print(f"no artifact written (sim rc={proc.returncode})")
        return 1
    # a crashed sim leaves a loadable PARTIAL artifact (per-key flush):
    # an incomplete run or nonzero sim exit must never read as a green
    # full-contract pass (code-review r10)
    incomplete = not art.get("complete") or proc.returncode != 0
    print(f"\n=== sf1 full-contract summary (sim wall {wall}s) ===")
    for k in sorted(res):
        r = res[k]
        if "err" in r and r["err"]:
            verdict = f"ERR {r['err']}"
        elif str(r.get("mode", "")).startswith("rows-only"):
            verdict = f"{r['mode']} rows={r['rows']} hash={r['spark_hash']}"
        else:
            verdict = "green" if r.get("hash_match") else "RED"
        print(f"{k:32s} spark={r.get('spark_sec', '?'):>7}s "
              f"oracle={r.get('oracle_sec', '?'):>7}s {verdict}")
    bad = [k for k, r in res.items()
           if r.get("err") or r.get("hash_match") is False]
    print(f"keys={len(res)} red={bad}"
          + (f" INCOMPLETE (sim rc={proc.returncode})" if incomplete else ""))
    return 1 if bad or incomplete else 0


if __name__ == "__main__":
    sys.exit(main())
