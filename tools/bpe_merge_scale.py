"""One-off: bpe_train at a realistic merge count (VERDICT r5 item 7).

The registered `word_count` bpe variants run N_MERGES=10 — one driver
round-trip (1-row argmax collect) plus one localCheckpoint per merge.
Fine at 10; a real tokenizer needs 10k-32k merges, so the question is
whether the per-merge cadence stays flat as the loop runs long (state
SHRINKS as merges fuse symbols, but the driver round-trip and
checkpoint overhead are per-iteration constants, and leaked
checkpoint RDDs or a growing plan would show up as trend + RSS).

This harness runs bpe_train(n_merges=500) on the sf0.1 vocabulary and
reports total wall, the per-merge trend (mean of merges 1-50 vs
451-500), symbol-state row counts before/after, and Python-driver RSS
before/after. Results go into SCALING.md §BPE.

Usage: python tools/bpe_merge_scale.py [n_merges]
"""

from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uw_hadoop_aglorithms_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rss_mb() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    spark = get_spark("bpe-merge-scale")
    spark.sparkContext.setLogLevel("ERROR")

    from uw_hadoop_aglorithms_spark.operators import bpe

    # instrument the loop from outside: run it in windows of 50 merges
    # is NOT equivalent (state restarts), so time the real loop via a
    # monkeypatched apply_merge that records per-iteration wall.
    times: list[float] = []
    orig_apply = bpe.apply_merge
    last = [time.perf_counter()]

    def timed_apply(st, left, right):
        now = time.perf_counter()
        times.append(now - last[0])
        last[0] = now
        return orig_apply(st, left, right)

    bpe.apply_merge = timed_apply
    before = rss_mb()
    t0 = time.perf_counter()
    try:
        merges, st = bpe.bpe_train(spark, SF, n_merges=n_merges)
    finally:
        bpe.apply_merge = orig_apply
    wall = time.perf_counter() - t0
    rows_after = st.count()
    after = rss_mb()

    head = times[:50]
    tail = times[-50:]
    print(
        f"bpe_train n_merges={n_merges} sf={SF}: wall={wall:.1f}s "
        f"({wall / max(len(merges), 1):.3f}s/merge), learned={len(merges)}"
    )
    print(
        f"per-merge trend: first50={sum(head) / len(head):.3f}s "
        f"last50={sum(tail) / len(tail):.3f}s"
    )
    print(f"final symbol-state rows={rows_after}")
    print(f"driver RSS {before}->{after} MB")
    spark.stop()


if __name__ == "__main__":
    main()
