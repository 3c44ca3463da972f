"""Catalog: load the engine's tables from a scale-factor directory.

Replaces the reference's per-program scan code (every Q*.scala re-implements
its own `--text` / `--parquet` branch, e.g. reference Spark/SparkSQL/
Q1.scala:30-41). One loader, named schemas, Parquet-native; the physical
scan choice belongs to the engine, not a user flag.

Scale notes:
- `spark.read.parquet` keeps the scan columnar and lets Catalyst push
  filters and prune columns down to the row-group level — at 100 TB, a
  typed-date filter skips whole row groups via min/max stats.
- Nothing here collects to the driver; `Catalog` hands out lazy DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from uw_hadoop_aglorithms_spark.sources.schemas import TABLE_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = tuple(TABLE_SCHEMAS)


class Catalog:
    """Named-schema table access over one scale-factor directory.

    Usage::

        cat = Catalog(spark, "/root/testdata/sf0.01")
        cat.lineitem            # DataFrame (lazy)
        cat.table("orders")     # same thing, dynamic name
        cat.register_views()    # expose all tables to spark.sql(...)
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in TABLE_SCHEMAS:
            raise KeyError(f"unknown table {name!r}; catalog has {sorted(TABLE_SCHEMAS)}")
        if name not in self._cache:
            if name == "events":
                self._cache[name] = self._load_events()
            else:
                self._cache[name] = self.spark.read.parquet(
                    f"{self.sf_dir}/{name}.parquet"
                )
        return self._cache[name]

    def _load_events(self) -> DataFrame:
        """Normalize `events.ts` to session-TZ TIMESTAMP whatever the parquet
        physical type is.

        The testdata has shipped `ts` as both parquet TIMESTAMP(NANOS) —
        which Spark's reader rejects ([PARQUET_TYPE_ILLEGAL]) unless read as
        a long — and plain TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ).
        Branch on the dtype actually read instead of assuming one encoding:

        - LongType (nanosAsLong fallback): truncate nanos → micros with
          integer `div`, not float division, because ~1.7e18 ns exceeds
          double's 2^53 integer range; truncation matches DuckDB's
          TIMESTAMP_NS → TIMESTAMP conversion, keeping oracles exact.
        - Any timestamp type (TIMESTAMP / TIMESTAMP_NTZ): cast to the
          session-TZ TIMESTAMP declared in schemas.EVENTS and pass through.
        """
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = self.spark.read.parquet(f"{self.sf_dir}/events.parquet")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = raw.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_SCHEMAS:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql() queries."""
        for name in TABLE_SCHEMAS:
            self.table(name).createOrReplaceTempView(name)

    def validate_schemas(self) -> list[str]:
        """Compare on-disk schemas against the declared ones; return drift.

        Empty list == everything matches. Names and types must agree
        field-for-field (nullability is not enforced: Parquet marks all
        testdata columns nullable).
        """
        problems: list[str] = []
        for name, expected in TABLE_SCHEMAS.items():
            actual = self.table(name).schema
            got = [(f.name, f.dataType.simpleString()) for f in actual.fields]
            want = [(f.name, f.dataType.simpleString()) for f in expected.fields]
            if got != want:
                problems.append(f"{name}: disk={got} declared={want}")
        return problems


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Convenience: dict of all tables (lazy DataFrames) for one sf dir."""
    cat = Catalog(spark, sf_dir)
    return {name: cat.table(name) for name in TABLE_SCHEMAS}
