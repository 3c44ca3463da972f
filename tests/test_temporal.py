"""Temporal operator invariants at sf0.001 (oracle hash parity — incl.
DuckDB's native ASOF JOIN — is the driver's job)."""

from __future__ import annotations

from uw_hadoop_aglorithms_spark.operators import temporal
from tests.conftest import SF_TEST


def test_sessions_partition_events(spark):
    rows = temporal.user_sessions(spark, SF_TEST).collect()
    n_events = spark.read.parquet(f"{SF_TEST}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n_events
    by_user = {}
    for r in rows:
        assert r.session_start <= r.last_ts
        by_user.setdefault(r.user_id, []).append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r.session_start)
        for a, b in zip(sess, sess[1:]):
            # consecutive sessions are separated by >= the gap
            assert (b.session_start - a.last_ts).total_seconds() >= temporal.SESSION_GAP_S


def test_asof_matches_latest_prior_order(spark):
    rows = temporal.asof_last_order(spark, SF_TEST).collect()
    ev = spark.read.parquet(f"{SF_TEST}/events.parquet")
    assert len(rows) == ev.count()
    orders = spark.read.parquet(f"{SF_TEST}/orders.parquet").collect()
    by_cust = {}
    for o in orders:
        by_cust.setdefault(o.o_custkey, []).append(o)
    for r in rows[:200]:  # spot-check against a brute-force scan
        cands = [o for o in by_cust.get(r.user_id, []) if o.o_orderdate <= r.ts]
        if not cands:
            assert r.last_order_key is None
            continue
        best_date = max(o.o_orderdate for o in cands)
        best_key = max(o.o_orderkey for o in cands if o.o_orderdate == best_date)
        assert r.last_order_date == best_date
        assert r.last_order_key == best_key


def test_range_join_banding_is_lossless(spark):
    """The ±1-bucket banding must find EXACTLY the pairs a brute-force
    scan finds (any |diff| <= window pair falls in an adjacent bucket)."""
    got = {
        (r.purchase_id, r.other_id)
        for r in temporal.range_join_nearby_events(spark, SF_TEST).collect()
    }
    from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

    ev = Catalog(spark, SF_TEST).events.collect()
    import math
    by_user = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    brute = set()
    for es in by_user.values():
        for p in es:
            if p.event_type != "purchase":
                continue
            for o in es:
                if o.event_id == p.event_id:
                    continue
                diff = abs(
                    math.floor(o.ts.timestamp()) - math.floor(p.ts.timestamp())
                )
                if diff <= temporal.RANGE_WINDOW_S:
                    brute.add((p.event_id, o.event_id))
    assert got == brute
