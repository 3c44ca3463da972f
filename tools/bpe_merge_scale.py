"""One-off: bpe_train at a realistic merge count (VERDICT r5 item 7).

The registered `word_count` bpe variants run N_MERGES=10 — one driver
round-trip (1-row argmax collect) plus one localCheckpoint per merge.
Fine at 10; a real tokenizer needs 10k-32k merges, so the question is
whether the per-merge cadence stays flat as the loop runs long (state
SHRINKS as merges fuse symbols, but the driver round-trip and
checkpoint overhead are per-iteration constants, and leaked
checkpoint RDDs or a growing plan would show up as trend + RSS).

This harness runs bpe_train(n_merges=500) and reports total wall, the
per-merge trend (mean of merges 1-50 vs the last 50), symbol-state row
counts before/after, and Python-driver RSS before/after. Results go
into SCALING.md §BPE.

Two vocab modes, because the testdata corpus has only 31 DISTINCT
WORDS (measured; BPE exhausts it at 107 merges — every word fuses to
one symbol):

  corpus     the real sf0.1 vocabulary (measures exhaustion + the
             small-state cadence floor);
  synthetic  tokenizer-realistic state: all word triples of the
             corpus's 31 words (29,791 distinct "words", ~700k symbol
             rows) with deterministic Zipf-ish frequencies — the
             |vocab| x avg-len state a 100k-word real corpus produces.

Usage: python tools/bpe_merge_scale.py [n_merges] [corpus|synthetic] [batch_k]

batch_k > 1 runs bpe_train_batched instead of the serial trainer —
the round-6 batched-merge-selection answer to the serial cadence.
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


def synthetic_state(spark, sf_dir):
    """Tokenizer-scale (w, freq, pos, sym) state: the corpus's distinct
    words crossed into ordered triples (31^3 = 29,791 distinct words),
    freq = the product of the component words' corpus counts compressed
    to a Zipf-ish long — same schema and symbol alphabet as the real
    state, ~50x the word count."""
    from pyspark.sql import functions as F

    from uw_hadoop_aglorithms_spark.functions.text import tokens
    from uw_hadoop_aglorithms_spark.operators.bpe import EOW
    from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

    base = (
        Catalog(spark, sf_dir)
        .documents.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    a, b, c = base.alias("a"), base.alias("b"), base.alias("c")
    words = (
        a.crossJoin(b)
        .crossJoin(c)
        .select(
            F.concat(F.col("a.w"), F.col("b.w"), F.col("c.w")).alias("w"),
            (
                F.log(F.col("a.f") * F.col("b.f") * F.col("c.f")) * 100
            ).cast("long").alias("freq"),
        )
    )
    syms = F.expr(
        "array_append(transform(sequence(1, length(w)), "
        f"i -> substr(w, i, 1)), '{EOW}')"
    )
    return words.select(
        "w", "freq", F.posexplode(syms).alias("pos", "sym")
    ).select("w", "freq", F.col("pos").cast("long").alias("pos"), "sym")


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    mode = sys.argv[2] if len(sys.argv) > 2 else "corpus"
    batch_k = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark("bpe-merge-scale")
    spark.sparkContext.setLogLevel("ERROR")

    from uw_hadoop_aglorithms_spark.operators import bpe

    # instrument the loop from outside: running it in windows of 50
    # merges is NOT equivalent (state restarts), so time the real loop
    # via a monkeypatched apply_merge_batch that records per-round wall
    # (per-merge for the serial trainer, per-batch for batched).
    times: list[float] = []
    orig_apply = bpe.apply_merge_batch
    last = [time.perf_counter()]

    def timed_apply(st, pairs):
        now = time.perf_counter()
        times.append(now - last[0])
        last[0] = now
        return orig_apply(st, pairs)

    bpe.apply_merge_batch = timed_apply
    init = synthetic_state(spark, SF) if mode == "synthetic" else None
    rows_before = init.count() if init is not None else None
    before = rss_mb()
    t0 = time.perf_counter()
    # times[0] still spans the trainer's own init materialization (the
    # pre-loop checkpoint), not a merge round — reset the clock here so
    # it at least excludes synthetic_state/count/RSS setup, and drop it
    # from the head window below
    last[0] = t0
    try:
        if batch_k > 1:
            merges, st = bpe.bpe_train_batched(
                spark, SF, n_merges=n_merges, batch_k=batch_k,
                init_state=init,
            )
        else:
            merges, st = bpe.bpe_train(
                spark, SF, n_merges=n_merges, init_state=init
            )
    finally:
        bpe.apply_merge_batch = orig_apply
    wall = time.perf_counter() - t0
    rows_after = st.count()
    after = rss_mb()

    head = times[1:51]  # times[0] = trainer init, not a merge round
    tail = times[-50:]
    print(
        f"bpe_train n_merges={n_merges} mode={mode} batch_k={batch_k} "
        f"sf={SF}: wall={wall:.1f}s "
        f"({wall / max(len(merges), 1):.3f}s/merge over "
        f"{len(times)} rounds), learned={len(merges)}, "
        f"init_rows={rows_before}"
    )
    print(
        f"per-merge trend: first50={sum(head) / max(len(head), 1):.3f}s "
        f"last50={sum(tail) / max(len(tail), 1):.3f}s"
    )
    print(f"final symbol-state rows={rows_after}")
    print(f"driver RSS {before}->{after} MB")
    spark.stop()


if __name__ == "__main__":
    main()
