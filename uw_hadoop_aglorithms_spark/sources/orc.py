"""ORC source/sink (beyond-reference columnar interchange format).

Parquet is the engine's canonical storage (SURVEY.md §1.3); ORC exists
because mixed lakes routinely hold Hive-era ORC tables, and Spark reads
and writes it natively (same vectorized columnar reader machinery as
Parquet: predicate pushdown via ORC stripe/row-group statistics, column
projection, no Python anywhere). Same named-schema contract as the
Parquet/.tbl/JSONL paths: a query is identical regardless of physical
format.

Scale notes: ORC scans split by stripe; pushdown and pruning behave
like Parquet's. Nothing in the engine's operator layer knows which
columnar format backed the catalog — the roundtrip test proves the
swap is lossless for every column type the schemas use (dates,
timestamps, doubles, arrays stay intact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from uw_hadoop_aglorithms_spark.sources.schemas import TABLE_SCHEMAS


def write_orc(df: DataFrame, path: str) -> None:
    """Write a DataFrame as ORC (snappy, Spark default)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read ORC with the named schema of catalog table `table` (explicit
    StructType — schema drift fails loudly instead of inferring)."""
    if table not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {table!r}; catalog has {sorted(TABLE_SCHEMAS)}")
    return spark.read.schema(TABLE_SCHEMAS[table]).orc(path)
