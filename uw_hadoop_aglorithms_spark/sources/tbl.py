"""TPC-H `.tbl` pipe-delimited text source/sink (SURVEY.md §2.1 S2/S6).

The reference reads `.tbl` text by splitting on '|' and indexing fields
positionally (reference Spark/SparkSQL/Q1.scala:37-38, Q6.scala:39-40);
the scan choice is a user flag. Here the text path is a real source with
the SAME named schemas as the Parquet path — `spark.read.csv` with an
explicit StructType, so a query is identical regardless of the physical
format.

Scale notes: CSV scans split by byte ranges and parallelize per file;
schema is declared (no inference pass over 100 TB); dates/timestamps
parse with explicit formats. Parquet remains the engine's canonical
format — this source exists for ingest parity with the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.sources.schemas import TABLE_SCHEMAS

TIMESTAMP_FMT = "yyyy-MM-dd HH:mm:ss"


def write_tbl(df: DataFrame, path: str) -> None:
    """Write a DataFrame as pipe-delimited `.tbl` text (no header).

    Timestamps serialize as `yyyy-MM-dd HH:mm:ss` so the text roundtrips
    bit-exactly through read_tbl at second precision (the reference's
    date-as-string representation, SURVEY.md §1.2)."""
    (
        df.write.mode("overwrite")
        .options(
            sep="|",
            header=False,
            timestampFormat=TIMESTAMP_FMT,
            timestampNTZFormat=TIMESTAMP_FMT,
        )
        .csv(path)
    )


def read_tbl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read `.tbl` text with the named schema of catalog table `table`."""
    if table not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {table!r}; catalog has {sorted(TABLE_SCHEMAS)}")
    return (
        spark.read.options(
            sep="|",
            header=False,
            timestampFormat=TIMESTAMP_FMT,
            timestampNTZFormat=TIMESTAMP_FMT,
        )
        .schema(TABLE_SCHEMAS[table])
        .csv(path)
    )


def write_text(df: DataFrame, path: str) -> None:
    """Single-column text sink (reference TextOutputFormat /
    saveAsTextFile, WordCount.java:175): each row becomes one line; multi
    column frames are tab-joined first."""
    cols = [F.col(c).cast("string") for c in df.columns]
    out = df.select(F.concat_ws("\t", *cols).alias("value"))
    out.write.mode("overwrite").text(path)
