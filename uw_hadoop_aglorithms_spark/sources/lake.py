"""Partitioned-lake layout: date-partitioned writes + pruned reads.

At 100 TB the events table lives date-partitioned (`dt=YYYY-MM-DD/`
directories); a time-bounded query must read only the matching
directories (PartitionFilters), not scan-and-discard. This module wraps
that layout so the pruning behavior is a tested engine property rather
than a deployment convention. The reference's only layout control was
reducer counts and non-splitable inputs (SURVEY.md §2.1 S4); Hive-style
partition pruning is its Spark-native replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Write with a derived `dt` partition column (one directory per day).

    Partition count = distinct days — bounded, unlike partitioning by a
    high-cardinality key (the classic small-files mistake)."""
    (
        df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )


def read_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Read one day; the `dt` filter prunes to one directory (asserted in
    tests/test_lake.py via PartitionFilters)."""
    return spark.read.parquet(path).filter(F.col("dt") == day).drop("dt")
