"""JSON-lines source/sink (beyond-reference source format).

The reference's only semi-structured data is the `props` JSON string
riding inside the events CSV replay (consumed via get_json_object in
operators/pipeline.py). Training-data lakes, however, commonly EXCHANGE
whole tables as JSONL — one JSON object per line — so the engine ships
it as a first-class source with the same named schemas as the Parquet
and `.tbl` paths: a query is identical regardless of physical format.

Scale notes: JSONL scans split by byte ranges per file and parse
JVM-side (Jackson inside the scan operator, no Python); the schema is
declared, so there is no inference pass over 100 TB, and unreferenced
fields are never materialized (Spark's JSON reader projects during
parse). Timestamps serialize in a fixed format so a write/read
roundtrip is exact at microsecond precision. Parquet remains the
canonical format — JSONL exists for interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from uw_hadoop_aglorithms_spark.sources.schemas import TABLE_SCHEMAS

#: Microsecond-precision format: JSONL roundtrips `ts` columns exactly
#: (the catalog normalizes events.ts to micros; seconds would truncate).
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_OPTS = {"timestampFormat": _TS_FMT, "timestampNTZFormat": _TS_FMT}


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a DataFrame as JSON-lines (one object per line)."""
    df.write.mode("overwrite").options(**_OPTS).json(path)


def read_jsonl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read JSONL with the named schema of catalog table `table` —
    explicit StructType, no schema inference."""
    if table not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {table!r}; catalog has {sorted(TABLE_SCHEMAS)}")
    return (
        spark.read.options(**_OPTS).schema(TABLE_SCHEMAS[table]).json(path)
    )
