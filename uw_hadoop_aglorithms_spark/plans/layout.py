"""Physical-layout helpers shared by CPU-bound operators.

The dedup / fingerprint / similarity operators run interpreter-heavy
Catalyst expressions (per-char hash folds, per-dim vector folds) whose
cost is CPU, not IO — they need every core busy, which means enough
input partitions. Locally the fixture arrives as ONE parquet row group,
so a repartition is load-bearing there; at lake scale the input already
has >= cores splits and an unconditional repartition would shuffle full
document bodies for nothing (petabyte traffic at 100 TB). The
scale-correct lever for split count is `spark.sql.files.maxPartitionBytes`,
not a shuffle — so the repartition here is CONDITIONAL on the scan
actually being under-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_for_cpu(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition on `keys` ONLY if the plan has fewer partitions than
    the session's cores; otherwise a no-op (rely on split sizing)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *[F.col(k) for k in keys])
