"""CSV source/sink with named schemas (beyond-reference source format).

The reference's streaming jobs replay CSV part-files but parse them by
hand with split(',') and positional indexing (reference
EventCount.scala:108-118 and the Bespin CSV mappers); here CSV is a
first-class declared-schema format like Parquet/JSONL/ORC: the same
named catalog schema drives the scan, so a query is identical
regardless of physical format and there is NO inference pass.

Scale notes: CSV scans split by byte range per file and parse JVM-side
(univocity inside the scan operator); column pruning happens during
parse, and PERMISSIVE-mode corruption handling is disabled in favor of
FAILFAST — a 100 TB ingest job must fail loudly on a malformed row,
not silently null it. Quoting/escaping is RFC-4180 (the default), so
free-text columns with commas and newlines roundtrip. Timestamps use a
fixed micros format (write/read roundtrips are exact). Parquet remains
the canonical format — CSV exists for interchange with the reference's
replay corpus and spreadsheet-adjacent producers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from uw_hadoop_aglorithms_spark.sources.schemas import TABLE_SCHEMAS

#: Micros-precision timestamps; header on so files are self-describing.
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_OPTS = {
    "header": "true",
    "timestampFormat": _TS_FMT,
    "timestampNTZFormat": _TS_FMT,
    # write/read embedded newlines inside quoted fields correctly
    "multiLine": "true",
    "escape": '"',
}


def write_csv(df: DataFrame, path: str) -> None:
    """Write a DataFrame as headered RFC-4180 CSV."""
    df.write.mode("overwrite").options(**_OPTS).csv(path)


def read_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read CSV with the named schema of catalog table `table` —
    explicit StructType, FAILFAST on malformed rows, no inference."""
    if table not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {table!r}; catalog has {sorted(TABLE_SCHEMAS)}")
    return (
        spark.read.options(**_OPTS, mode="FAILFAST")
        .schema(TABLE_SCHEMAS[table])
        .csv(path)
    )
