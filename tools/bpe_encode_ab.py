"""A/B: relational rule-replay encode vs broadcast rank-priority encode.

encode_words replays rules one window pass each — right for the oracle
contract at N_MERGES=10, wrong at production rule counts (32k passes
regardless of how few fire). encode_words_broadcast is the
HF/SentencePiece apply step: rules broadcast, per-word rank-priority
merging in an Arrow-batched mapInPandas over DISTINCT words.

Measures both over the synthetic triple vocabulary (29,791 distinct
words — bpe_merge_scale's tokenizer-scale state) with every rule the
fixture corpus can learn (exhausts at 107). Results go to SCALING.md.

Usage: python tools/bpe_encode_ab.py [n_merges] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uw_hadoop_aglorithms_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bpe-encode-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from bpe_merge_scale import synthetic_state

    from uw_hadoop_aglorithms_spark.operators import bpe

    merges, _ = bpe.bpe_train(spark, SF, n_merges=n_merges)
    words = (
        synthetic_state(spark, SF)
        .select("w")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_words = words.count()
    print(f"rules={len(merges)} distinct_words={n_words}")

    for name, fn in (
        ("relational", bpe.encode_words),
        ("broadcast", bpe.encode_words_broadcast),
    ):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n = fn(words, merges).count()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(
            f"{name}: median {ts[len(ts) // 2]:.2f}s of {reps} "
            f"(all {['%.2f' % t for t in ts]}), rows={n}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
