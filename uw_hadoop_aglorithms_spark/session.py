"""SparkSession factory tuned for the engine's workload shape.

The reference hand-tuned Hadoop jobs per-site (3 GB task heaps, 32 MB split
caps, reducer counts as CLI flags — e.g. reference MapReduce/PMI/
PairsPMI.java:253-257, WordCount.java:132-133). Here the equivalent knobs are
set once, centrally, and AQE re-plans at runtime: shuffle partition counts
coalesce to the data, small joins flip to broadcast, skewed joins split.

At cluster scale the same settings hold: AQE sizes shuffles from runtime
stats rather than a static guess, so the config survives a 1000-executor
deployment without per-query retuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
#: AQE coalescing floor (round 12): the default 1m floor coalesces any
#: sub-32MB shuffle to ONE post-shuffle partition (parallelismFirst's
#: target is max(total/parallelism, minPartitionSize)), serializing the
#: CPU-heavy post-shuffle stages of the text/dedup operators whenever
#: the shuffled bytes are small — measured 4.5 s -> 2.8 s on
#: minhash_lsh_dedup at sf0.1 (interleaved n=5 minima). Scale-neutral:
#: at cluster scale the 64MB advisory target governs coalescing long
#: before a 64k floor matters; the floor only stops a small shuffle
#: from collapsing below the cluster's parallelism.
DEFAULT_AQE_MIN_PARTITION = os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k")
#: local-mode JVM heap: in local[*] the "executors" live inside the driver
#: JVM, so the default 1g heap GC-thrashes under cached state + 32 task
#: threads. On a real cluster the launcher sizes executors instead.
DEFAULT_DRIVER_MEMORY = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")


def get_spark(
    app_name: str = "uw-hadoop-aglorithms-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the session is created by the launcher and this factory only
    layers SQL conf on top (``SparkSession.builder`` reuses the active
    session).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.driver.memory", DEFAULT_DRIVER_MEMORY)
        # AQE: runtime re-planning — partition coalescing, dynamic broadcast
        # conversion, skew-join splitting. This is the engine's answer to the
        # reference's hand-tuned reducer counts and split-size caps.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            DEFAULT_AQE_MIN_PARTITION,
        )
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow makes the few Pandas-UDF escape hatches (SGD fold, streaming
        # state) batch-transfer instead of row-at-a-time pickling.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamps in the testdata are timezone-naive; pin the session zone
        # so window bucketing and date_trunc are deterministic everywhere.
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
