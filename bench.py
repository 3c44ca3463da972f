"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints a COMPACT JSON line as the FINAL line of stdout:
    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1, "n": REPS}

The driver captures only a short tail of stdout, so the final line must
stay small (round-4 lesson: adding spread/metrics to it grew the line
past the capture window and the official artifact lost ALL timings).
The full artifact — spread ([min,max] per query across reps), per-query
shuffle/input bytes, peak JVM heap, errors — is written to
``BENCH_local.json`` next to this file (commit it per round as
``BENCH_local_r{N}.json``), and also echoed to stderr for live runs.

Timing protocol: one throwaway action first (JVM + codegen warm-up, not
attributable to any query), then REPS whole-suite passes — every query
runs once per pass, and each query reports its median ACROSS passes.
Interleaving decorrelates the host's multi-minute slow windows from any
single key (back-to-back reps all landed in the same window; see
SCALING.md §Measurement variance). Queries return small results by
design (aggregates / top-k), so the action is collect(); row counts are
sanity-checked to stay small.

Shuffle protocol (BASELINE.md §Measurement protocol): per-query shuffle
read/write and input bytes come from the Spark UI REST API
(/api/v1/applications/<app>/stages), attributed by stage-id delta
around the FIRST rep of each query (shuffle volume is plan-determined,
so reps agree; the first rep also matches how a cold cluster run would
read). Peak executor memory is the driver-JVM heap high-water mark from
/executors — app-level, since a high-water mark cannot be reset between
queries.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time
import urllib.request

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import __spark_entry__ as entry_mod  # noqa: E402
from tools.engineversions import engine_versions  # noqa: E402
from uw_hadoop_aglorithms_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
#: Repetitions per query; reports the MEDIAN (BASELINE.md protocol:
#: median of warm runs). Default 3 so round-over-round comparisons
#: aren't single-run noise; set 1 for a quick local pass.
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
#: Comma-separated key filter for targeted A/B runs (empty = all keys).
#: A filtered run writes BENCH_local_partial.json, never the whole-suite
#: BENCH_local.json close-out artifact (VERDICT r9 §Next 7).
ONLY = {k for k in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if k}


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


class StageMetrics:
    """Per-query shuffle/input bytes via the UI REST API, by stage delta.

    Every call to ``delta()`` returns the stages completed since the last
    call, summed. Fails soft: if the UI is disabled or a request errors,
    metrics come back empty and the bench still runs (round-2 lesson:
    nothing in this harness may abort the timing loop).
    """

    def __init__(self, spark):
        self.base = None
        try:
            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            if ui:
                self.base = f"{ui}/api/v1/applications/{app}"
        except Exception:
            pass
        self.seen: set[tuple[int, int]] = set()
        if self.base:
            for s in self._stages():
                self.seen.add((s["stageId"], s["attemptId"]))

    def _get(self, path: str):
        with urllib.request.urlopen(f"{self.base}{path}", timeout=10) as r:
            return json.load(r)

    def _stages(self):
        try:
            return self._get("/stages?status=complete")
        except Exception:
            return []

    def delta(self) -> dict[str, int]:
        if not self.base:
            return {}
        out = {"shuffle_read": 0, "shuffle_write": 0, "input_bytes": 0, "n_stages": 0}
        for s in self._stages():
            key = (s["stageId"], s["attemptId"])
            if key in self.seen:
                continue
            self.seen.add(key)
            out["shuffle_read"] += s.get("shuffleReadBytes", 0)
            out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
            out["input_bytes"] += s.get("inputBytes", 0)
            out["n_stages"] += 1
        return out

    def peak_jvm_heap(self) -> int | None:
        if not self.base:
            return None
        try:
            peaks = [
                e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0)
                for e in self._get("/executors")
            ]
            return max(peaks) if peaks else None
        except Exception:
            return None


def _fingerprint_diff(metrics: dict[str, dict[str, int]]) -> dict:
    """Compare plan-determined metrics against the newest committed
    BENCH_local_r{N}.json. Returns {baseline, identical, changed} where
    `changed` maps key -> {field: [prev, cur]} for any key whose stage
    count or shuffle/input bytes moved (new/removed keys listed too)."""
    arts = sorted(
        (
            int(m.group(1)), os.path.join(REPO_ROOT, f)
        )
        for f in os.listdir(REPO_ROOT)
        if (m := re.match(r"BENCH_local_r(\d+)\.json$", f))
    )
    if not arts:
        return {"baseline": None}
    _, path = arts[-1]
    try:
        prev = json.load(open(path)).get("metrics", {})
    except Exception:
        return {"baseline": os.path.basename(path), "error": "unreadable"}
    fields = ("n_stages", "shuffle_read", "shuffle_write", "input_bytes")
    changed: dict[str, dict] = {}
    identical = []
    for k in sorted(set(prev) | set(metrics)):
        if k not in prev:
            changed[k] = {"new_key": True}
        elif k not in metrics:
            changed[k] = {"removed_key": True}
        else:
            diffs = {
                f: [prev[k].get(f), metrics[k].get(f)]
                for f in fields
                if prev[k].get(f) != metrics[k].get(f)
            }
            if diffs:
                changed[k] = diffs
            else:
                identical.append(k)
    return {
        "baseline": os.path.basename(path),
        "identical_keys": len(identical),
        "changed": changed,
    }


def main() -> None:
    spark = get_spark("uw-hadoop-aglorithms-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, parquet footer reads, codegen pipeline — and the
    # once-per-process schema-drift checks (catalog._check_schema,
    # round 13 / ADVICE r12), so the first TIMED query doesn't pay the
    # 8 footer reads. Timing methodology unchanged: still one throwaway
    # untimed action before the interleaved passes.
    from uw_hadoop_aglorithms_spark.sources.catalog import TABLE_NAMES, Catalog

    warm_cat = Catalog(spark, SF_DIR)
    for t in TABLE_NAMES:
        warm_cat.table(t)
    warm_cat.nation.count()

    #: Reps are INTERLEAVED as whole-suite passes (pass 1 runs every
    #: key once, then pass 2, …) rather than back-to-back per key: the
    #: host virtualization exhibits multi-minute slow windows (uniform
    #: 1.3-2× wall-clock with byte-identical plans/shuffle volumes —
    #: measured round 6, SCALING.md §Measurement variance), and
    #: consecutive reps all land inside the same window, poisoning that
    #: key's median. Across interleaved passes a window taxes different
    #: keys in different passes and the per-key median recovers.
    samples: dict[str, list[float]] = {}
    metrics: dict[str, dict[str, int]] = {}
    errors: dict[str, str] = {}
    tracker = StageMetrics(spark)
    qmap = [
        (name, fn)
        for name, fn in sorted(entry_mod.queries().items())
        if not ONLY or name in ONLY
    ]
    for rep in range(REPS):
        for name, fn in qmap:
            if name in errors:
                continue
            # A failing query must cost ONLY its own timing, never the
            # run: round 2 lost ALL bench data because one broken query
            # aborted the loop before a single timing was emitted.
            try:
                t0 = time.perf_counter()
                rows = fn(spark, SF_DIR).collect()
                samples.setdefault(name, []).append(time.perf_counter() - t0)
                del rows
                if rep == 0:
                    m = tracker.delta()
                    if m:
                        metrics[name] = m
            except Exception as exc:  # noqa: BLE001 — record and move on
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
            # per-query scratch caches (shingle sets, graph edges, …)
            # must not accumulate across the run
            spark.catalog.clearCache()
            # re-baseline the stage set so later reps / failed queries
            # don't leak their stages into the next query's first-rep
            # delta
            tracker.delta()
            # Release cross-query garbage OUTSIDE the timers: clearCache
            # does not free localCheckpoint RDDs or broadcasts — they die
            # only when their Python refs are collected and the
            # ContextCleaner runs, so without this, earlier queries'
            # leftovers tax later timings (measured ~2× on the graph
            # loops after 45 queries).
            gc.collect()
            spark.sparkContext._jvm.System.gc()
    timings = {
        name: round(sorted(s)[len(s) // 2], 3) for name, s in samples.items()
    }
    spreads = {
        name: [round(min(s), 3), round(max(s), 3)]
        for name, s in samples.items()
    }

    compact = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_from_dir(SF_DIR),
        "n": REPS,
    }
    if errors:
        # names only in the compact line; full messages go to the file
        compact["failed"] = sorted(errors)
    full = dict(compact)
    if REPS > 1:
        full["spread"] = spreads
    # per-key MIN across reps: the host shows multi-minute uniform
    # 1.3-2x slow windows (SCALING.md §Measurement variance), so the
    # minimum — not the median — is the comparable round-over-round
    # number when a window lands mid-run
    full["min"] = {name: round(min(s), 3) for name, s in samples.items()}
    if metrics:
        full["metrics"] = metrics
        # plan-fingerprint diff vs the newest committed BENCH_local_r{N}
        # artifact: a wall-clock regression whose stage counts and
        # shuffle/input bytes are byte-identical is host noise by
        # construction (plan-determined metrics can't change without the
        # plan changing) — this auto-labels what the round-6 judge had
        # to derive by hand
        full["fingerprint_diff"] = _fingerprint_diff(metrics)
    peak = tracker.peak_jvm_heap()
    if peak is not None:
        full["peak_jvm_heap_bytes"] = peak
    # engine versions (VERDICT r7 §What's missing 3): full artifact only
    # — the compact stdout line must stay inside the driver's capture tail
    full["versions"] = engine_versions(spark)
    if errors:
        full["errors"] = errors
    # Driver-environment diagnostic (round 9, VERDICT r8 §Next 1): the
    # driver commits this stdout's TAIL (~2000 chars) back into
    # BENCH_r{N}.json, so a few ultra-compact DG lines printed here run
    # the two CORRECTNESS-red keys against an in-process DuckDB oracle
    # IN THE DRIVER'S OWN ENVIRONMENT and localize the divergence
    # (per-variant/per-column match bits + env fingerprint) even if
    # CORRECTNESS_r09 stays red. Printed BEFORE the compact line so the
    # driver's final-line parse is untouched; tools/benchdiag.py
    # documents the 2000-char budget. SPARK_GRAFT_BENCH_NODIAG=1 skips.
    dg: list[str] = []
    if not os.environ.get("SPARK_GRAFT_BENCH_NODIAG"):
        try:
            from tools.benchdiag import diag_lines

            dg = diag_lines(spark, SF_DIR)
        except Exception as exc:  # noqa: BLE001 — diag must never abort bench
            dg = [f"DG ERR harness {type(exc).__name__}: {exc}"[:140]]
        full["diag"] = dg

    # A SPARK_GRAFT_BENCH_ONLY-filtered A/B run must not clobber the
    # whole-suite close-out artifact (VERDICT r9 §Next 7 / the round-8
    # footgun): filtered runs land in BENCH_local_partial.json instead.
    full_name = "BENCH_local_partial.json" if ONLY else "BENCH_local.json"
    if ONLY:
        full["only"] = sorted(ONLY)
    full_path = os.path.join(REPO_ROOT, full_name)
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    print(json.dumps(full), file=sys.stderr)
    compact_line = json.dumps(compact, separators=(",", ":"))
    # the driver's tail capture is 2000 bytes: trim DG lines (whole
    # lines, from the front — detail first, env fingerprint last) so
    # the compact line always survives intact (ADVICE r9; byte-counted
    # since ADVICE r10 — json.dumps default ensure_ascii keeps the
    # compact line ASCII, but count bytes anyway for symmetry with
    # trim_to_budget)
    if dg:
        try:
            from tools.benchdiag import trim_to_budget

            dg = trim_to_budget(dg, 2000 - len(compact_line.encode()) - 1)
        except Exception:  # noqa: BLE001 — e.g. the benchdiag import
            # already failed above; keep the short ERR tail rather than
            # letting a diag import abort the bench after its timings
            # were collected (code-review r10)
            dg = dg[-2:]
    for ln in dg:
        print(ln)
    # COMPACT line LAST on stdout — the driver tail-captures stdout and
    # must be able to parse this line whole.
    print(compact_line)
    spark.stop()


if __name__ == "__main__":
    main()
