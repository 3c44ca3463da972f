"""Count-min sketch: structural guarantees on the sf0.001 fixture.

Cross-engine value parity runs via test_oracle_parity; here we assert
the sketch-theoretic properties that make CMS trustworthy at scale.
"""

from __future__ import annotations

from tests.conftest import SF_TEST
from uw_hadoop_aglorithms_spark.operators import sketches


def test_cms_never_underestimates_and_collides(spark):
    rows = sketches.cms_token_counts(spark, SF_TEST).collect()
    assert rows
    # one-sided error: the estimate can only overcount
    assert all(r.cms_count >= r.exact_count for r in rows)
    # W is sized below the vocabulary so at least one bucket collision
    # must inflate an estimate — the property the sketch is FOR
    assert any(r.cms_count > r.exact_count for r in rows)


def test_cms_estimate_bounded_by_total_mass(spark):
    from pyspark.sql import functions as F

    from uw_hadoop_aglorithms_spark.functions.text import tokens
    from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

    rows = sketches.cms_token_counts(spark, SF_TEST).collect()
    total = (
        Catalog(spark, SF_TEST)
        .documents.select(F.explode(tokens("text")))
        .count()
    )
    # any single-bucket sum is at most the whole stream's mass
    assert all(r.cms_count <= total for r in rows)


# --------------------------------------------------------------------------
# engine-neutral HLL (round 6): mergeability, rollup persistence, bounds
# --------------------------------------------------------------------------

def _events(spark):
    from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

    return Catalog(spark, SF_TEST).events


def _reg_set(df):
    from pyspark.sql import functions as F

    if "dt" in df.columns:  # partition inference types dt as DATE
        df = df.withColumn("dt", F.col("dt").cast("string"))
    return {tuple(r) for r in df.collect()}


def test_hll_register_ranges(spark):
    regs = sketches.hll_day_registers(_events(spark), "user_id", ("event_type",))
    rows = regs.collect()
    assert rows
    assert all(0 <= r.b < sketches.HLL_M for r in rows)
    assert all(1 <= r.rho <= 31 for r in rows)


def test_hll_merge_is_a_true_sketch_union(spark):
    """max-merging registers built over ANY partition of the data equals
    the registers built over the whole — the property that makes the
    per-day rollup (and any distributed partial aggregation) exact."""
    from pyspark.sql import functions as F

    ev = _events(spark)
    whole = sketches.hll_merge(
        sketches.hll_day_registers(ev, "user_id", ("event_type",)),
        ("event_type",),
    )
    halves = [
        sketches.hll_day_registers(
            ev.filter(F.col("event_id") % 2 == p), "user_id", ("event_type",)
        )
        for p in (0, 1)
    ]
    merged = sketches.hll_merge(halves[0].unionAll(halves[1]), ("event_type",))
    assert _reg_set(merged) == _reg_set(whole)


def test_hll_rollup_persists_and_answers_range_queries(spark, tmp_path):
    """The deployment shape: per-day register rows persisted as parquet;
    a later session answers a date-range distinct-count from the rollup
    alone, identically to sketching the range's raw events."""
    from pyspark.sql import functions as F

    ev = _events(spark)
    path = str(tmp_path / "hll_rollup")
    sketches.hll_day_registers(ev, "user_id", ("event_type",)).write.parquet(path)

    stored = spark.read.parquet(path)
    days = sorted(r.dt for r in stored.select("dt").distinct().collect())
    lo, hi = days[0], days[len(days) // 2]
    from_rollup = sketches.hll_estimate(
        sketches.hll_merge(stored.filter(F.col("dt").between(lo, hi)), ()), ()
    ).collect()[0]
    direct = sketches.hll_estimate(
        sketches.hll_merge(
            sketches.hll_day_registers(
                ev.filter(F.date_format("ts", "yyyy-MM-dd").between(lo, hi)),
                "user_id",
                ("event_type",),
            ),
            (),
        ),
        (),
    ).collect()[0]
    assert tuple(from_rollup) == tuple(direct)


def test_hll_suite_certs_hold(spark):
    """Every registered HLL row's 20% bound cert must be TRUE on the
    fixture (the oracle only proves both engines AGREE on the boolean;
    this pins that the boolean is the passing one). Exercises both
    estimator regimes: users sit in linear counting, event_ids in the
    raw-estimate branch (asserted via v_empty)."""
    from uw_hadoop_aglorithms_spark.operators import suites

    rows = suites.distinct_users(spark, SF_TEST).collect()
    by_variant = {}
    for r in rows:
        by_variant.setdefault(r.variant, []).append(r)
    assert all(r.cert for r in rows)
    assert {v for v in by_variant} == {
        "exact", "hll_users", "hll_events", "hll_regsum", "hll_rollup",
        "kmv_users", "kmv_inter", "kmv_rollup",
    }
    # regime split on the fixture: few users -> empty buckets remain
    assert all(r.aux > 0 for r in by_variant["hll_users"])
    assert {r.k for r in by_variant["hll_rollup"]} == {"all_days", "first_week"}


def test_hll_exact_division_identity_property():
    """The portability cornerstone: round((C - C%S)/S) computed in IEEE
    doubles equals C//S for every reachable S (C < 2^53 guarantees both
    operands are exactly representable and the division of an exact
    multiple is exact). Checked over the S extremes and a dense sample —
    in pure Python floats, which follow the same IEEE-754 semantics both
    engines use."""
    import random

    c = sketches.HLL_C
    assert c < 2**53
    rng = random.Random(6)
    s_values = (
        [sketches.HLL_M, sketches.HLL_M * (1 << 31)]  # all-saturated / empty
        + [rng.randrange(256, 256 * (1 << 31)) for _ in range(20000)]
    )
    for s in s_values:
        exact = (c - (c % s)) / s  # the shared ANSI fragment, in doubles
        assert exact == c // s, (s, exact, c // s)


def test_hll_rollup_maintenance_follows_lake_mutations(spark, tmp_path):
    """The lake-lifecycle tie-in: a merge's affected-day list is exactly
    the rollup refresh set. After an upsert that rewrites some days'
    rows, refreshing ONLY those rollup partitions must equal a full
    rebuild from the mutated lake, and the other rollup partitions'
    files must stay byte-identical (a max-sketch cannot decrement, so
    day-rebuild is the maintenance contract)."""
    from pyspark.sql import functions as F

    from uw_hadoop_aglorithms_spark.sources import lake as lake_mod

    ev = _events(spark).select("event_id", "ts", "user_id", "event_type")
    lake = str(tmp_path / "lake")
    roll = str(tmp_path / "rollup")
    lake_mod.write_date_partitioned(ev, lake)
    sketches.refresh_hll_rollup(spark, lake, roll, "user_id")

    # patch: early-day events get REASSIGNED user ids (same event time,
    # so the key keeps its day — the merge contract)
    upd = (
        ev.filter((F.col("event_id") % 7 == 0) & (F.dayofmonth("ts") <= 5))
        .withColumn("user_id", F.col("user_id") + 1000)
    )
    affected = lake_mod.merge_into_lake(spark, lake, upd)
    assert affected

    before = lake_mod.snapshot_files(roll)
    refreshed = sketches.refresh_hll_rollup(
        spark, lake, roll, "user_id", days=affected
    )
    assert refreshed == sorted(affected)
    after = lake_mod.snapshot_files(roll)
    changed_parts = {
        rel.split("/")[0]
        for rel in set(before) | set(after)
        if before.get(rel) != after.get(rel)
    }
    assert changed_parts <= {f"dt={d}" for d in affected}
    untouched = [r for r in before if r.split("/")[0] not in changed_parts]
    assert untouched and all(before[r] == after[r] for r in untouched)

    # surgical refresh == full rebuild from the mutated lake
    roll2 = str(tmp_path / "rollup_full")
    sketches.refresh_hll_rollup(spark, lake, roll2, "user_id")
    got = _reg_set(spark.read.parquet(roll))
    want = _reg_set(spark.read.parquet(roll2))
    assert got == want
    # and the mutation is VISIBLE in the sketch (new ids -> new registers)
    assert got != _reg_set(
        sketches.hll_day_registers(ev, "user_id", ("event_type",))
    )


def test_hll_rollup_vacates_deleted_days(spark, tmp_path):
    """GDPR-erasure flow: delete_from_lake vacates a whole day; feeding
    its returned day list to refresh_hll_rollup must REMOVE that rollup
    partition (not crash, not leave stale registers counting erased
    users), while surviving listed days are rebuilt."""
    from pyspark.sql import functions as F

    from uw_hadoop_aglorithms_spark.sources import lake as lake_mod

    ev = _events(spark).select("event_id", "ts", "user_id", "event_type")
    lake = str(tmp_path / "lake")
    roll = str(tmp_path / "rollup")
    lake_mod.write_date_partitioned(ev, lake)
    all_days = sketches.refresh_hll_rollup(spark, lake, roll, "user_id")
    victim = all_days[0]

    kill = (
        spark.read.parquet(lake)
        .withColumn("dt", F.col("dt").cast("string"))
        .filter(
            (F.col("dt") == victim)
            | ((F.col("dt") == all_days[1]) & (F.col("event_id") % 3 == 0))
        )
        .select("event_id")
    )
    affected = lake_mod.delete_from_lake(spark, lake, kill)
    assert victim in affected and all_days[1] in affected

    refreshed = sketches.refresh_hll_rollup(
        spark, lake, roll, "user_id", days=affected
    )
    assert refreshed == sorted(affected)
    left = {
        r.dt
        for r in spark.read.parquet(roll)
        .select(F.col("dt").cast("string").alias("dt"))
        .distinct().collect()
    }
    assert victim not in left and all_days[1] in left
    # and a full rebuild agrees with the surgical state
    roll2 = str(tmp_path / "rollup_full")
    sketches.refresh_hll_rollup(spark, lake, roll2, "user_id")
    assert _reg_set(spark.read.parquet(roll)) == _reg_set(
        spark.read.parquet(roll2)
    )


def test_kmv_unsaturated_regime_is_exact(spark):
    """At SF_TEST there are fewer distinct users than K, so every
    per-type sample is UNSATURATED: the sketch holds the whole key-hash
    set, theta spans the full hash range, and both the per-type and the
    intersection estimators collapse to exact counts (modulo the ~n²/P
    hash-collision rate, zero on this fixture)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_TEST}/events.parquet")
    samples = sketches.kmv_samples(ev)
    stats = {r.g: r for r in sketches.kmv_group_stats(samples).collect()}
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert stats and set(stats) == set(exact)
    for g, r in stats.items():
        assert r.c < sketches.KMV_K, "fixture must be in the unsaturated regime"
        assert r.kmv_est == exact[g]
        assert r.theta == 1_000_000_007
    inter = sketches.kmv_intersections(samples).collect()
    assert len(inter) == len(exact) * (len(exact) - 1) // 2
    ut = ev.select("user_id", F.col("event_type").alias("g")).distinct()
    ex_pair = {
        (r.ga, r.gb): r.n
        for r in ut.alias("x")
        .join(
            ut.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.g") < F.col("y.g")),
        )
        .groupBy(F.col("x.g").alias("ga"), F.col("y.g").alias("gb"))
        .agg(F.countDistinct(F.col("x.user_id")).alias("n"))
        .collect()
    }
    for r in inter:
        assert r.inter_est == ex_pair.get((r.ga, r.gb), 0)


def test_kmv_merge_law_union_then_retake(spark):
    """Mergeability — the rollup law: the sketch of A ∪ B equals
    re-taking the K smallest over the union of the two sketches (same
    law as hll_merge's register max, so per-day KMV rollups compose the
    same way the HLL rollup does)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    full = sketches.kmv_samples(ev)
    half_a = sketches.kmv_samples(ev.where(F.col("event_id") % 2 == 0))
    half_b = sketches.kmv_samples(ev.where(F.col("event_id") % 2 == 1))
    w = Window.partitionBy("g").orderBy("h")
    merged = (
        half_a.select("g", "h")
        .unionAll(half_b.select("g", "h"))
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= sketches.KMV_K)
    )
    want = {(r.g, r.h) for r in full.collect()}
    got = {(r.g, r.h) for r in merged.collect()}
    assert got == want


def test_kmv_rollup_lifecycle_parity_with_hll(spark, tmp_path):
    """refresh_kmv_rollup follows refresh_hll_rollup's contract exactly
    (VERDICT r6 item 6): surgical day refresh after a lake merge equals
    a full rebuild with untouched partitions byte-stable; a vacated day
    is removed from the rollup; and the MERGE LAW holds — day samples
    unioned and re-taken to K produce the identical sketch (hence the
    identical estimate) as a direct single-pass sketch."""
    from pyspark.sql import functions as F

    from uw_hadoop_aglorithms_spark.sources import lake as lake_mod

    ev = _events(spark).select("event_id", "ts", "user_id", "event_type")
    lake = str(tmp_path / "lake")
    roll = str(tmp_path / "rollup")
    lake_mod.write_date_partitioned(ev, lake)
    sketches.refresh_kmv_rollup(spark, lake, roll, "user_id")

    # merge law: rollup-merged sketch == direct sketch, bit for bit
    rolled = sketches.kmv_merge_all(spark.read.parquet(roll), "all")
    direct = sketches.kmv_samples(ev.withColumnRenamed("event_type", "g0"),
                                  "user_id", "g0")
    direct_h = {r.h for r in
                sketches.kmv_merge_all(
                    sketches.kmv_day_samples(ev), "all").collect()}
    assert {r.h for r in rolled.collect()} == direct_h
    est_roll = sketches.kmv_group_stats(rolled).collect()[0]
    # direct single-pass sketch over the whole corpus (one group)
    one = ev.withColumn("g1", F.lit("all"))
    est_direct = sketches.kmv_group_stats(
        sketches.kmv_samples(one, "user_id", "g1")
    ).collect()[0]
    assert (est_roll.kmv_est, est_roll.hk) == (
        est_direct.kmv_est, est_direct.hk)

    # surgical refresh after an upsert: only affected partitions change
    upd = (
        ev.filter((F.col("event_id") % 7 == 0) & (F.dayofmonth("ts") <= 5))
        .withColumn("user_id", F.col("user_id") + 1000)
    )
    affected = lake_mod.merge_into_lake(spark, lake, upd)
    assert affected
    before = lake_mod.snapshot_files(roll)
    refreshed = sketches.refresh_kmv_rollup(
        spark, lake, roll, "user_id", days=affected
    )
    assert refreshed == sorted(affected)
    after = lake_mod.snapshot_files(roll)
    changed_parts = {
        rel.split("/")[0]
        for rel in set(before) | set(after)
        if before.get(rel) != after.get(rel)
    }
    assert changed_parts <= {f"dt={d}" for d in affected}
    untouched = [r for r in before if r.split("/")[0] not in changed_parts]
    assert untouched and all(before[r] == after[r] for r in untouched)
    roll2 = str(tmp_path / "rollup_full")
    sketches.refresh_kmv_rollup(spark, lake, roll2, "user_id")
    assert _reg_set(spark.read.parquet(roll)) == _reg_set(
        spark.read.parquet(roll2)
    )

    # vacated day: delete a whole day, refresh with the returned list
    all_days = sorted(
        r.dt for r in spark.read.parquet(roll)
        .select(F.col("dt").cast("string").alias("dt")).distinct().collect()
    )
    victim = all_days[0]
    kill = (
        spark.read.parquet(lake)
        .withColumn("dt", F.col("dt").cast("string"))
        .filter(F.col("dt") == victim)
        .select("event_id")
    )
    affected = lake_mod.delete_from_lake(spark, lake, kill)
    assert victim in affected
    sketches.refresh_kmv_rollup(spark, lake, roll, "user_id", days=affected)
    left = {
        r.dt for r in spark.read.parquet(roll)
        .select(F.col("dt").cast("string").alias("dt")).distinct().collect()
    }
    assert victim not in left
