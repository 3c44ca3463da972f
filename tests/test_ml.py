"""Spam classifier vs a pure-Python sequential oracle (SURVEY.md §5.2).

The oracle reimplements: instance derivation (polyhash features, label%2),
the deterministic shuffle order (universal-family hash of doc_id), and the
SGD fold with delta=0.002 — byte-for-byte the semantics of operators/ml.py,
independently in plain Python over the raw parquet.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from uw_hadoop_aglorithms_spark.functions import intlog
from uw_hadoop_aglorithms_spark.functions.hashing import P, hash_params
from uw_hadoop_aglorithms_spark.operators import ml
from tests.conftest import SF_TEST


def _polyhash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def _shuffle_key(doc_id: int) -> int:
    a, b = hash_params(ml.SHUFFLE_MEMBER)
    return ((doc_id % P) * a + b) % P


def _python_instances():
    con = duckdb.connect()
    docs = con.execute(
        f"""
        SELECT d.doc_id, d.text, e.label % 2 AS label
        FROM read_parquet('{SF_TEST}/documents.parquet') d
        JOIN read_parquet('{SF_TEST}/embeddings.parquet') e ON e.vec_id = d.doc_id
        """
    ).fetchall()
    out = []
    for doc_id, text, label in docs:
        toks = [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]
        feats = sorted({_polyhash(t) % ml.FEATURE_SPACE for t in toks})
        out.append((doc_id, int(label), feats))
    return out


def _python_train(insts):
    train = [(d, l, f) for d, l, f in insts if d % 5 != 0]
    train.sort(key=lambda r: (_shuffle_key(r[0]), r[0]))
    w: dict[int, float] = {}
    for _, label, feats in train:
        score = sum(w.get(f, 0.0) for f in feats)
        p = intlog.sigmoid_py(score)
        g = math.floor((label - p) * ml.DELTA * ml.DYADIC_Q + 0.5) / ml.DYADIC_Q
        for f in feats:
            w[f] = w.get(f, 0.0) + g
    return w


@pytest.fixture(scope="module")
def py_model():
    return _python_train(_python_instances())


def test_train_matches_python_oracle(spark, py_model):
    engine = {r.feature: r.weight for r in ml.spam_train(spark, SF_TEST).collect()}
    assert set(engine) == set(py_model)
    worst = max(abs(engine[f] - py_model[f]) for f in py_model)
    assert worst < 1e-9, f"max weight delta {worst}"


def test_apply_matches_python_oracle(spark, py_model):
    insts = _python_instances()
    expected = {}
    for d, label, feats in insts:
        if d % 5 == 0:
            score = sum(py_model.get(f, 0.0) for f in feats)
            expected[d] = (label, "spam" if score > 0 else "ham")
    rows = ml.spam_apply(spark, SF_TEST).collect()
    got = {r.doc_id: (r.label, r.prediction) for r in rows}
    assert got == expected


def test_ensemble_vote_range(spark):
    rows = ml.spam_ensemble(spark, SF_TEST).collect()
    assert rows
    for r in rows:
        assert r.vote in (-3, -1, 1, 3)
        assert r.prediction_vote == ("spam" if r.vote > 0 else "ham")


def test_sigmoid_bit_identical_across_engines():
    """The SQL replay oracle (_spam_oracle) uses the engine-neutral
    dyadic sigmoid (round 8, replacing libm exp() whose cross-engine
    bit-equality was platform-libm luck): assert the generated DuckDB
    chain == intlog.sigmoid_py bit-for-bit over the score range the
    fold can produce, and that it tracks the true logistic."""
    import random

    con = duckdb.connect()
    rng = random.Random(0x516)
    xs = [0.0, 1e-9, -1e-9, 0.002, -0.5, 1.5, -3.25, 7.0, -42.0, 100.0,
          -100.0, 8191.0, -8191.0, 0.1234567891234]
    xs += [rng.uniform(-60, 60) for _ in range(300)]
    con.execute("CREATE TABLE s(x DOUBLE)")
    con.executemany("INSERT INTO s VALUES (?)", [(x,) for x in xs])
    q = intlog.sigmoid_oracle_sql("SELECT x FROM s", "x", "p")
    got = dict(con.execute(f"SELECT x, p FROM ({q})").fetchall())
    for x in xs:
        py = intlog.sigmoid_py(x)
        assert got[x] == py, f"sigmoid({x}): python {py!r} != duckdb {got[x]!r}"
        true_p = 1.0 / (1.0 + math.exp(-max(min(x, 700.0), -700.0)))
        assert abs(py - true_p) < 1e-8


def _python_batch_gd(insts):
    """Pure-Python replay of the batch-GD design: algebraic sigmoid +
    dyadic quantization — every value must be BIT-identical to Spark's
    (no rounding contract, by construction)."""
    train = [(d, l, f) for d, l, f in insts if d % 5 != 0]
    test = [(d, l, f) for d, l, f in insts if d % 5 == 0]
    eta_n = ml.GD_ETA / len(train)
    w: dict[int, float] = {}
    for _ in range(ml.GD_ITERS):
        dw: dict[int, float] = {}
        for _, label, feats in train:
            s = sum(w.get(f, 0.0) for f in feats)  # exact: dyadic terms
            p = 0.5 * (1.0 + s / (1.0 + abs(s)))
            g = math.floor((label - p) * eta_n * ml.GD_Q + 0.5) / ml.GD_Q
            for f in feats:
                dw[f] = dw.get(f, 0.0) + g  # exact
        for f, d in dw.items():
            w[f] = w.get(f, 0.0) + d  # exact
    scores = {
        d: sum(w.get(f, 0.0) for f in feats) for d, _, feats in test
    }
    return w, scores


def test_batch_gd_bit_identical_to_python_replay(spark):
    """The distributed full-batch GD must match the sequential Python
    replay BIT-FOR-BIT (==, not approx): the dyadic-quantization design
    claims order-independent exact arithmetic, so any engine or any
    aggregation order must produce identical doubles."""
    w_py, s_py = _python_batch_gd(_python_instances())
    rows = ml.spam_batch_gd(spark, SF_TEST).collect()
    w_sp = {int(r.id): r.score for r in rows if r.kind == "w"}
    s_sp = {int(r.id): r.score for r in rows if r.kind == "score"}
    assert w_sp == w_py
    assert s_sp == s_py
    # and the weights really are exact multiples of 2^-40
    for v in w_sp.values():
        assert v * ml.GD_Q == math.floor(v * ml.GD_Q)
    for r in rows:
        if r.kind == "score":
            assert r.prediction == ("spam" if r.score > 0 else "ham")


def test_batch_gd_invariant_under_partitioning(spark):
    """The dyadic-exactness claim is 'any aggregation order produces
    identical doubles' — drive it directly: the same training run under
    a different shuffle-partition count (different partial-agg trees)
    must be bit-identical, weights and scores both."""
    def run():
        rows = ml.spam_batch_gd(spark, SF_TEST).collect()
        return {(r.kind, int(r.id)): (r.score, r.prediction) for r in rows}

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = run()
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        b = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_sgd_envelope_guard_trips_on_partial_sum_magnitude(monkeypatch):
    """Constructed near-envelope case (VERDICT r6 item 4): the fold's
    guard bounds the SUM OF |w[f]| over a doc's features — not just the
    final score — so transient cancellation cannot silently leave the
    exact dyadic grid. With the envelope tightened to just above one
    gradient step, a doc whose features carry CANCELLING weights (score
    ~ 0, well under any score-only guard) must still trip it; the same
    stream passes untouched one step earlier."""
    import pandas as pd
    import pytest

    from uw_hadoop_aglorithms_spark.operators import ml

    def fold(rows):
        batches = iter([pd.DataFrame(
            {"features": [r[0] for r in rows], "label": [r[1] for r in rows]}
        )])
        return {int(r.feature): r.weight
                for _, r in next(ml._sgd_fold(batches)).iterrows()}

    # step 1: feature 1 trained toward +, feature 2 toward - (from the
    # empty model both steps apply g = ±DELTA/2 exactly)
    warm = [([1], 1), ([2], 0)]
    w = fold(warm)
    assert w[1] > 0 > w[2]
    # a probe doc over BOTH features has score w1 + w2 == 0.0 exactly
    # (symmetric gradients) but abs-sum 2|g|
    two_g = abs(w[1]) + abs(w[2])
    assert two_g > 0
    # envelope just above one step's |g|: the warm stream alone is fine
    # (each step sees at most one weight), the probe doc trips
    monkeypatch.setattr(ml, "SGD_ENVELOPE", two_g * 0.75)
    fold(warm)  # no doc sees both weights -> passes
    with pytest.raises(ValueError, match="exactness envelope"):
        fold(warm + [([1, 2], 1)])
    # control: at the real envelope the probe passes (scores tiny)
    monkeypatch.setattr(ml, "SGD_ENVELOPE", 8192.0)
    out = fold(warm + [([1, 2], 1)])
    assert abs(out[1] + out[2]) < 1.0


def test_segmented_replay_invariant_under_segmentation(monkeypatch):
    """Round 11 (VERDICT r10 §Next 2): the spam oracle's recursive
    replay is SEGMENTED — earlier segments reach a step as a
    materialized per-feature weight table instead of a gradient history
    (ml.FOLD_SEGMENTS note). Exactness claim: gradients are exact 2^-40
    multiples, so the regrouped score is bit-identical for ANY segment
    count. Pin it: force many live segments on the sf0.001 corpus —
    BOTH knobs patched, since the generated width w = greatest(ceil(
    N/FOLD_SEGMENTS), FOLD_MIN_WIDTH) caps live segments at
    FOLD_SEGMENTS no matter the floor (code-review r11) — 16 segments ×
    floor 5 exercises 16 chained carried-weight tables and every
    boundary shape; compare the full oracle frame against the shipped
    configuration's. A single-segment run (width floor 10^9) — the
    pre-round-11 single-fold semantics — must also agree."""
    from tools.canon import lines_of, vhash

    def run(sql):
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_TEST}/{t}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        con.close()
        return vhash(lines_of(cols, rows)), len(rows)

    shipped = run(ml.ML_ORACLES["spam"])
    monkeypatch.setattr(ml, "FOLD_SEGMENTS", 16)
    monkeypatch.setattr(ml, "FOLD_MIN_WIDTH", 5)
    many = run(ml._spam_oracle())
    monkeypatch.setattr(ml, "FOLD_MIN_WIDTH", 10**9)
    single = run(ml._spam_oracle())
    assert shipped == many == single, (
        f"segmentation changed the replay: shipped={shipped} "
        f"many-segments={many} single-segment={single}"
    )
