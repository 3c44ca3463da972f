"""Job-style CLI: run any registered query by name, like the reference.

The reference's jobs are launched by class name with `-input [path]
-output [path] -reducers [num]` (args4j options — reference
MapReduce/Counting/WordCount.java:126-135); a user switching engines
keeps the same shape here:

    python -m uw_hadoop_aglorithms_spark wordcount \
        -input /root/testdata/sf0.01 -output /tmp/cnt -reducers 4

- the job name is any `queries()` key (`list` prints them all, plus the
  reference-era aliases);
- `-input` is the table directory (the parquet tables the driver
  contract reads);
- `-output` writes the result via the engine's interchange sinks
  (`-format parquet|csv|jsonl`, default parquet); omitted → the first
  `-show` rows print to stdout instead (the course workflow's
  `cat output/part-*` equivalent);
- `-reducers` maps to `spark.sql.shuffle.partitions`, the engine's
  one knob for the reference's hand-tuned reducer counts (AQE coalesces
  below it at runtime, so oversizing is safe — SCALING.md).

Aliases keep the reference's job names working: WordCount →
`word_count`, PairsPMI/StripesPMI → `pmi`, BuildInvertedIndex{,
Compressed} + BooleanRetrieval{,Compressed} → `inverted_index` /
`boolean_retrieval`, RunPersonalizedPageRankBasic → `pagerank_suite`,
ApplyEnsembleSpamClassifier etc. → `spam`, EventCount /
RegionEventCount / TrendingArrivals → their streaming keys.
"""

from __future__ import annotations

import argparse
import sys

#: reference job/class name (lowercased) → queries() key
ALIASES: dict[str, str] = {
    "wordcount": "word_count",
    "perfectx": "perfect_follower",
    "bigramfrequency": "bigram_relfreq",
    "computebigramrelativefrequencypairs": "bigram_relfreq",
    "computebigramrelativefrequencystripes": "bigram_relfreq",
    "pairspmi": "pmi",
    "stripespmi": "pmi",
    "buildinvertedindex": "inverted_index",
    "buildinvertedindexcompressed": "inverted_index",
    "booleanretrieval": "boolean_retrieval",
    "booleanretrievalcompressed": "boolean_retrieval",
    "runpersonalizedpagerankbasic": "pagerank_suite",
    "trainspamclassifier": "spam",
    "applyspamclassifier": "spam",
    "applyensemblespamclassifier": "spam",
    "eventcount": "window_counts",
    "regioneventcount": "window_counts",
    "trendingarrivals": "trending_arrivals",
    "q1": "q1", "q2": "q2", "q3": "q3", "q4": "q4", "q5": "q5",
    "q6": "q6", "q7": "q7",
}


def main(argv: list[str] | None = None) -> int:
    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()

    ap = argparse.ArgumentParser(
        prog="python -m uw_hadoop_aglorithms_spark",
        description=__doc__.split("\n\n")[0],
    )
    ap.add_argument("job", help="queries() key, reference job name, or 'list'")
    ap.add_argument("-input", dest="input", metavar="[path]",
                    help="table directory (sf dir)")
    ap.add_argument("-output", dest="output", metavar="[path]",
                    help="result path; omitted -> print -show rows")
    ap.add_argument("-reducers", dest="reducers", metavar="[num]", type=int,
                    help="shuffle partition count (AQE coalesces below it)")
    ap.add_argument("-format", dest="format", default="parquet",
                    choices=("parquet", "csv", "jsonl"),
                    help="output format (default parquet)")
    ap.add_argument("-show", dest="show", metavar="[num]", type=int,
                    default=20, help="rows to print without -output")
    args = ap.parse_args(argv)

    job = args.job.strip()
    if job == "list":
        for name in sorted(qmap):
            print(name)
        return 0
    key = job if job in qmap else ALIASES.get(job.lower().replace("_", ""))
    if key is None or key not in qmap:
        print(f"unknown job {job!r}; `list` prints all keys", file=sys.stderr)
        return 2
    if not args.input:
        print("-input [path] is required to run a job", file=sys.stderr)
        return 2

    from uw_hadoop_aglorithms_spark.session import get_spark

    spark = get_spark(
        f"uw-hadoop-aglorithms-{key}", shuffle_partitions=args.reducers
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = qmap[key](spark, args.input)
    if args.output is None:
        df.show(args.show, truncate=False)
        return 0
    if args.format == "parquet":
        df.write.mode("overwrite").parquet(args.output)
    elif args.format == "csv":
        from uw_hadoop_aglorithms_spark.sources.csv import write_csv

        write_csv(df, args.output)
    else:
        from uw_hadoop_aglorithms_spark.sources.jsonl import write_jsonl

        write_jsonl(df, args.output)
    print(f"{key}: wrote {args.output} ({args.format})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
