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
                # streaming keys: stage/byte counts are partly
                # SCHEDULING-determined (micro-batch count varies with
                # trigger timing and load — observed 248 vs 294 stages,
                # identical code), so their band is wider; a strategy
                # flip still lands far outside it
                "tolerance": {
                    "stream_batch_equiv": {
                        "stages": 0.40,
                        "bytes": 0.40,
                        # input_bytes is session-history-dependent for
                        # this key: the replay-dir preparation (write +
                        # re-read) is skipped when a prior test already
                        # built it, dropping file-source reads ~3× with
                        # an identical plan. Shuffle volumes — what a
                        # strategy flip actually moves — stay asserted.
                        "skip_fields": ["input_bytes"],
                    }
                },
            },
            fh,
            indent=1,
        )
        fh.write("\n")
    print(json.dumps(m, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
