"""Z-order layout: result-identical reads + measurable 2-D locality."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.plans.zorder import Z_BITS, write_zordered, z_value
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog
from tests.conftest import SF_TEST

N_FILES = 16


def test_z_value_interleaves_bits(spark):
    rows = spark.range(1).select(
        z_value(F.lit(0b101), F.lit(0b011)).alias("z"),
        z_value(F.lit(0), F.lit(0)).alias("z0"),
        z_value(F.lit((1 << Z_BITS) - 1), F.lit((1 << Z_BITS) - 1)).alias("zmax"),
    ).first()
    # a bits land at even positions, b bits at odd: a=101, b=011
    # -> z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 0b011011
    assert rows.z == 0b011011
    assert rows.z0 == 0
    assert rows.zmax == (1 << (2 * Z_BITS)) - 1


def _files_with_matches(spark, path, predicate):
    return (
        spark.read.parquet(path)
        .where(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def test_zorder_concentrates_2d_matches(spark):
    """A narrow-user full-time box query: the time-sorted layout spreads
    the user's rows across ~every file, the z-ordered layout confines
    them to few files — and both layouts return identical rows."""
    ev = Catalog(spark, SF_TEST).events
    # a ~5%-wide user band taken from the data itself
    lo, hi = ev.select(
        F.percentile("user_id", F.lit(0.40)).cast("long"),
        F.percentile("user_id", F.lit(0.45)).cast("long"),
    ).first()
    pred = (F.col("user_id") >= lo) & (F.col("user_id") <= hi)

    base = tempfile.mkdtemp(prefix="zorder_")
    tsort = f"{base}/time_sorted"
    zord = f"{base}/zordered"
    (
        ev.repartitionByRange(N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(tsort)
    )
    minute = (F.unix_timestamp("ts") / 60).cast("long")
    write_zordered(ev, zord, F.col("user_id"), minute, n_files=N_FILES)

    expected = sorted(r.event_id for r in ev.where(pred).collect())
    got = sorted(r.event_id for r in spark.read.parquet(zord).where(pred).collect())
    assert got == expected

    t_files = _files_with_matches(spark, tsort, pred)
    z_files = _files_with_matches(spark, zord, pred)
    assert z_files < t_files, (z_files, t_files)
