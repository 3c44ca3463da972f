"""Record the plan-determined execution envelope of the top-5 most
expensive registered keys (VERDICT r9 §Next 5).

Fingerprint deltas were previously observed post-hoc in the committed
bench artifacts; this tool records, per key, the stage count and
shuffle/input byte volumes of one run at sf0.001 under the EXACT pytest
session shape (local[4], 8 shuffle partitions, UTC), and
tests/test_plan_envelope.py fails when a later run leaves the recorded
envelope (±tolerance) — a plan regression becomes a red test instead of
round-retrospective archaeology.

Usage: python tools/plan_envelopes.py   # rewrites tests/plan_envelopes.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

#: the five most expensive keys of BENCH_local_r09 — the ones whose plan
#: shape dominates the suite and whose regressions matter most
TOP_KEYS = (
    "neardup_pairs",
    "stream_batch_equiv",
    "pagerank_suite",
    "layout_suite",
    "corpus_curation",
)
SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(REPO, "tests", "plan_envelopes.json")

#: Keys whose FIRST run in a process does one-time input preparation
#: (suites._cached_replay_dir builds the replay dirs: write + count +
#: re-read, ~46 extra stages and ~3× input_bytes) — the round-10
#: "scheduling nondeterminism" (248 vs 294 stages) was exactly this
#: session-history split, not trigger timing: AvailableNow +
#: maxFilesPerTrigger=1 batch counts are deterministic. Warm these keys
#: once un-measured so the envelope captures the steady-state plan and
#: holds at the default ±10%/±25% tolerance regardless of what ran
#: earlier in the session.
WARMUP_KEYS = frozenset({"stream_batch_equiv"})


def measure(spark, keys=TOP_KEYS, sf_dir=SF_DIR) -> dict[str, dict[str, int]]:
    """Run each key once and return its stage-delta metrics (the same
    REST attribution bench.py uses). Shared by the recorder and the
    pytest so the two can never diverge on methodology."""
    import gc

    from bench import StageMetrics

    tracker = StageMetrics(spark)
    import __spark_entry__ as entry

    qmap = entry.queries()
    out: dict[str, dict[str, int]] = {}
    for name in keys:
        if name in WARMUP_KEYS:
            # un-measured warm-up: builds the process-cached replay dirs
            # so the measured run below is the steady-state plan
            qmap[name](spark, sf_dir).collect()
            spark.catalog.clearCache()
        # fresh-session cache state BEFORE the key, not only after: a
        # prior pytest that cached the same lineage (e.g. test_dedup's
        # shingle sets) would serve this key's scans from cache and
        # shrink its stage count below the fresh-session envelope
        # (observed: neardup_pairs 103 vs 121 stages)
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        tracker.delta()  # re-baseline: prior work must not leak in
        qmap[name](spark, sf_dir).collect()
        out[name] = tracker.delta()
        spark.catalog.clearCache()
    return out


def main() -> None:
    from uw_hadoop_aglorithms_spark.session import get_spark

    spark = get_spark(
        "plan-envelopes", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    m = measure(spark)
    with open(OUT, "w") as fh:
        json.dump(
            {
                "config": {"master": "local[4]", "parts": 8, "sf": SF_DIR},
                "metrics": m,
                # No per-key overrides since round 11: the 248-vs-294
                # stage split that forced a 40% streaming band in r10
                # was the replay-dir preparation landing inside the
                # FIRST measured run of a session (WARMUP_KEYS note) —
                # warmed, the steady-state count is deterministic and
                # the default ±max(3,10%)/±25% bands hold.
                "tolerance": {},
            },
            fh,
            indent=1,
        )
        fh.write("\n")
    print(json.dumps(m, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
