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

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Write with a derived `dt` partition column (one directory per day).

    Partition count = distinct days — bounded, unlike partitioning by a
    high-cardinality key (the classic small-files mistake).

    The dt label derives from integer epoch-day arithmetic
    (functions/days.utc_day_label): for a TimestampType column it is the
    UTC day of the instant under ANY session zone, so a lake ingested
    under one zone and refreshed under another labels the same event
    identically (closes ADVICE r8 medium: date_format over an instant
    renders in the session zone)."""
    from uw_hadoop_aglorithms_spark.functions.days import utc_day_label

    (
        df.withColumn("dt", utc_day_label(df, ts_col))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )


def read_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Read one day; the `dt` filter prunes to one directory (asserted in
    tests/test_lake.py via PartitionFilters)."""
    return spark.read.parquet(path).filter(F.col("dt") == day).drop("dt")


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    """Read a lake whose partitions may have DIVERGENT file schemas
    (after a widening merge): mergeSchema unions the footers, so
    partitions written before a column existed surface it as null.
    Costs one footer read per file at planning time — fine for a
    maintained lake (compact_day bounds file counts); a deployment
    caching table schemas in a metastore skips it entirely."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def snapshot_files(path: str) -> dict[str, tuple[int, int]]:
    """{relative file path: (size, mtime_ns)} over every data file under
    a lake directory — the before/after probe for the surgical-rewrite
    certificate (`merge_into_lake` must not touch unaffected partitions).
    Driver-side os.walk is bounded by FILE COUNT, not data size."""
    out: dict[str, tuple[int, int]] = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime_ns)
    return out


def merge_into_lake(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str = "event_id",
    ts_col: str = "ts",
    check_day_moves: bool = True,
) -> list[str]:
    """Copy-on-write MERGE (upsert) into a date-partitioned parquet lake:
    rows in `updates` replace same-key rows; unseen keys are inserted.
    Returns the list of rewritten `dt` partitions.

    This is the operation table formats (Delta/Hudi/Iceberg) exist for,
    hand-rolled on raw parquet because the plan shape — not the format
    metadata — is what decides the cost at 100 TB:

    - **Touch only affected days.** Affected = days holding an old
      version of an updated key ∪ days the updates land in. The base
      scan carries `dt IN (affected)` so partition pruning skips every
      other directory; a 1-day backfill against a 10-year lake reads
      1/3650th of the files.
    - **Anti-join on the key, then union the updates.** The updated-key
      set is a typical re-crawl batch — small next to the lake — so AQE
      broadcasts it and the anti-join is map-side over the pruned scan.
    - **Stage, then dynamic-partition overwrite.** The merged slice is
      written to a staging dir first (never read-and-overwrite the same
      path — Spark rejects it, and a failure mid-write must not corrupt
      the lake), then re-read and written with
      `partitionOverwriteMode=dynamic`, which replaces ONLY the
      partitions present in the staged slice. Untouched directories are
      never opened, let alone rewritten (certified byte-for-byte by
      `snapshot_files` in tests and in the layout_suite `merge` cert).

    Contract: an update to an EXISTING key must keep its day (a re-crawl
    replaces content at the same event time). A key changing days would
    leave its old row in a partition the merged slice no longer covers —
    dynamic overwrite cannot clear it — so that case raises. Deletions
    go through `delete_from_lake` (physical erasure), not here.

    Schema WIDENING is allowed: updates may carry columns the lake does
    not have yet (a re-crawl adds fields). Affected partitions gain the
    column (old rows null); untouched partitions keep their bytes, so
    reads must go through `read_lake` (mergeSchema) once a lake has
    mixed file schemas. Updates MISSING a base column raise — silently
    nulling existing data is never what a re-crawl means.

    Under the contract, affected days == the updates' own days, so the
    whole-lake semi-join exists only to DETECT violations — it is an
    audit, not a dependency. It scans the lake column-pruned to
    (key, dt) with a broadcast probe; at 100 TB pass
    `check_day_moves=False` when the key→day invariant is guaranteed
    upstream (key embeds event time, or an ingest-side index enforces
    it) and the merge touches nothing outside the updates' days.

    Reference parity: the reference has no update path at all — its
    sinks are one-shot MapFile/SequenceFile writes
    (BuildInvertedIndexCompressed.java:200); re-ingest means full
    rebuild. Incremental upsert is the lake-native replacement.
    """
    from uw_hadoop_aglorithms_spark.functions.days import utc_day_label

    # dt from integer epoch-day arithmetic: session-zone-independent for
    # instant-typed updates (write_date_partitioned docstring)
    up = updates.withColumn(
        "dt", utc_day_label(updates, ts_col)
    ).localCheckpoint()
    # partition-column inference types `dt` as DATE; normalize to the
    # writer's string form so day-set comparison and the union line up
    base = spark.read.parquet(path).withColumn("dt", F.col("dt").cast("string"))
    up_keys = up.select(key_col).distinct()
    new_days = {r.dt for r in up.select("dt").distinct().collect()}
    if not new_days:
        return []  # empty batch (e.g. a streaming no-data flush): no-op
    if check_day_moves:
        moved = {
            r.dt
            for r in base.filter(~F.col("dt").isin(sorted(new_days)))
            .join(F.broadcast(up_keys), key_col, "left_semi")
            .select("dt")
            .distinct()
            .collect()
        }
        if moved:
            raise ValueError(
                f"update moves keys out of partitions {sorted(moved)}: "
                "updates to existing keys must keep their day "
                "(dynamic overwrite cannot clear a vacated partition)"
            )
    missing = set(base.columns) - set(up.columns)
    if missing:
        raise ValueError(
            f"updates are missing base columns {sorted(missing)}: a merge "
            "may widen the schema but never drop data from existing columns"
        )
    days = sorted(new_days)
    affected = base.filter(F.col("dt").isin(days))
    merged = affected.join(F.broadcast(up_keys), key_col, "left_anti").unionByName(
        up, allowMissingColumns=True
    )

    _stage_and_overwrite(spark, merged, path)
    return days


def _stage_and_overwrite(spark: SparkSession, slice_df: DataFrame, path: str) -> None:
    """Write a dt-partitioned slice to staging, then dynamic-partition
    overwrite the lake with it — never read-and-overwrite one path.

    Staging lives UNDER the lake as a dot-prefixed child: Spark's file
    index skips hidden dirs, so concurrent lake reads never see it, and
    the lake's own filesystem is by definition the one every executor
    can write (a driver-local tempdir would break on a real cluster).
    On object storage this also keeps the final overwrite a same-bucket
    copy, not a cross-filesystem transfer."""
    staging = os.path.join(path, f".staging_{uuid.uuid4().hex}")
    try:
        slice_df.write.mode("overwrite").partitionBy("dt").parquet(staging)
        (
            spark.read.parquet(staging)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("dt")
            .parquet(path)
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def compact_day(
    spark: SparkSession, path: str, day: str, target_files: int = 1
) -> int:
    """Rewrite ONE day's files into `target_files` — the small-files
    repair a mutated lake needs (each merge/delete rewrite re-shards an
    affected day by the cluster's task count; a hot day mutated often
    accumulates files until scans pay per-file open cost). Returns the
    resulting file count.

    Content-preserving by construction (same rows, one coalesce), and
    surgical like the other maintenance ops: the pruned read touches
    only `dt=day`, the staged slice carries only that partition, and
    dynamic overwrite replaces only it (other days certified
    byte-identical in tests/test_lake.py). The dedup index has the same
    lifecycle step (operators/dedup.compact_neardup_index) for its
    bucketed tables; this is the lake-side analog."""
    one_day = (
        spark.read.parquet(path)
        .withColumn("dt", F.col("dt").cast("string"))
        .filter(F.col("dt") == day)
        .coalesce(target_files)
    )
    _stage_and_overwrite(spark, one_day, path)
    return sum(
        1 for rel in snapshot_files(path) if rel.startswith(f"dt={day}/")
    )


def delete_from_lake(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_col: str = "event_id",
) -> list[str]:
    """Copy-on-write DELETE (the takedown / GDPR-erasure path): rows
    whose key appears in `keys` are removed; every other byte of the
    lake is untouched. Returns the rewritten (or removed) partitions.

    Completes the lifecycle triangle with `write_date_partitioned`
    (insert) and `merge_into_lake` (upsert), sharing its scale posture:

    - Affected days come from ONE column-pruned scan of (key, dt) with
      a broadcast semi-join probe — the key set is a takedown batch,
      small next to the lake.
    - Survivors of affected days are rewritten via the same staging +
      dynamic-partition-overwrite seam; untouched days are never
      opened (certified byte-for-byte in tests/test_lake.py).
    - A day whose rows ALL die is VACATED: dynamic overwrite cannot
      write an empty partition, so vacated directories are removed
      explicitly after the overwrite commits (driver-side fs op, file
      count bounded by |affected days|; on object storage this is the
      same prefix delete a format's vacuum issues).

    Unlike the dedup index's tombstone lifecycle (operators/dedup.py —
    logical deletion consulted at query time, compacted later), this is
    PHYSICAL erasure: after return, no file under the lake contains the
    keys — the property an erasure request actually demands.
    """
    base = spark.read.parquet(path).withColumn("dt", F.col("dt").cast("string"))
    del_keys = keys.select(key_col).distinct().localCheckpoint()
    days = sorted(
        r.dt
        for r in base.join(F.broadcast(del_keys), key_col, "left_semi")
        .select("dt")
        .distinct()
        .collect()
    )
    if not days:
        return []
    survivors = base.filter(F.col("dt").isin(days)).join(
        F.broadcast(del_keys), key_col, "left_anti"
    )
    kept_days = {r.dt for r in survivors.select("dt").distinct().collect()}
    if kept_days:
        _stage_and_overwrite(spark, survivors, path)
    for day in days:
        if day not in kept_days:
            shutil.rmtree(os.path.join(path, f"dt={day}"), ignore_errors=True)
    return days
