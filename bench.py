"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Timing protocol: one throwaway action first (JVM + codegen warm-up, not
attributable to any query), then each query is executed once with a
result-materializing action. Queries return small results by design
(aggregates / top-k), so the action is collect(); row counts are sanity-
checked to stay small.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import __spark_entry__ as entry_mod  # noqa: E402
from uw_hadoop_aglorithms_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
#: Repetitions per query; reports the MEDIAN (BASELINE.md protocol:
#: median of warm runs). Default 3 so round-over-round comparisons
#: aren't single-run noise; set 1 for a quick local pass.
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark("uw-hadoop-aglorithms-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, parquet footer reads, codegen pipeline
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(entry_mod.queries().items()):
        samples = []
        # A failing query must cost ONLY its own timing, never the run:
        # round 2 lost ALL bench data because one broken query aborted
        # the loop before a single timing was emitted.
        try:
            for _ in range(REPS):
                t0 = time.perf_counter()
                rows = fn(spark, SF_DIR).collect()
                samples.append(time.perf_counter() - t0)
                del rows
                # per-query scratch caches (shingle sets, graph edges, …)
                # must not accumulate across the run
                spark.catalog.clearCache()
            timings[name] = round(sorted(samples)[len(samples) // 2], 3)
        except Exception as exc:  # noqa: BLE001 — record and move on
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
            spark.catalog.clearCache()
        # Release cross-query garbage OUTSIDE the timers: clearCache does
        # not free localCheckpoint RDDs or broadcasts — they die only when
        # their Python refs are collected and the ContextCleaner runs, so
        # without this, earlier queries' leftovers tax later timings
        # (measured ~2× on the graph loops after 45 queries).
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    result = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_from_dir(SF_DIR),
        "n": REPS,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
