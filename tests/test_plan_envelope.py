"""Plan-envelope budget for the five most expensive keys (VERDICT r9
§Next 5): stage counts and shuffle/input bytes are plan-determined, so
a drift outside the committed envelope means the PLAN changed — this
turns what used to be post-hoc bench-artifact archaeology into a red
test. Envelopes live in tests/plan_envelopes.json; re-record a
LEGITIMATE plan change (an intentional optimization) with
`python tools/plan_envelopes.py` and commit the diff alongside the
change that caused it.

Tolerances: stage count ±max(3, 10%) — AQE may merge/split a stage or
two on runtime stats; bytes ±25% — shuffle volumes wobble with
compression ratios and retry re-fetches but a strategy flip (broadcast
↔ shuffle, a lost pushdown, an extra exchange) moves them far more.
Round 11 removed the streaming per-key override: the 248-vs-294 stage
split was the one-time replay-dir preparation landing inside the first
measured run of a session, not trigger timing — measure() now warms
those keys (tools/plan_envelopes.WARMUP_KEYS), making the steady-state
count deterministic under the default bands.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from tools.plan_envelopes import SF_DIR, TOP_KEYS, measure

ENVELOPES = Path(__file__).parent / "plan_envelopes.json"
ALLOWLIST = Path(__file__).parent / "plan_allowlist.json"
BENCH_LOCAL = Path(__file__).parent.parent / "BENCH_local.json"


@pytest.fixture(scope="module")
def measured(spark):
    if not ENVELOPES.exists():
        pytest.fail(
            "tests/plan_envelopes.json missing — record it with "
            "`python tools/plan_envelopes.py`"
        )
    got = measure(spark, TOP_KEYS, SF_DIR)
    if not any(got.values()) or all(
        v.get("n_stages", 0) == 0 for v in got.values()
    ):
        pytest.skip("Spark UI REST unavailable — no stage metrics")
    return got


@pytest.mark.parametrize("key", TOP_KEYS)
def test_plan_envelope(measured, key):
    env = json.loads(ENVELOPES.read_text())
    want = env["metrics"][key]
    tol = env.get("tolerance", {}).get(key, {})
    got = measured[key]
    stage_tol = max(3, round(want["n_stages"] * tol.get("stages", 0.10)))
    assert abs(got["n_stages"] - want["n_stages"]) <= stage_tol, (
        f"{key}: stage count {got['n_stages']} left the envelope "
        f"{want['n_stages']}±{stage_tol} — the plan changed; if "
        f"intentional, re-record with tools/plan_envelopes.py"
    )
    byte_tol = tol.get("bytes", 0.25)
    for f in ("shuffle_read", "shuffle_write", "input_bytes"):
        if f in tol.get("skip_fields", ()):
            continue  # reason documented in the envelope file
        lo = want[f] * (1 - byte_tol) - 1
        hi = want[f] * (1 + byte_tol) + 1
        assert lo <= got[f] <= hi, (
            f"{key}: {f}={got[f]} left the envelope [{lo:.0f}, {hi:.0f}] "
            f"(recorded {want[f]}) — the plan changed; if intentional, "
            f"re-record with tools/plan_envelopes.py"
        )


def test_bench_fingerprint_allowlist():
    """Bench-SCALE (sf0.1) plan envelope (VERDICT r10 §Next 4): the
    sf0.001 envelopes above are blind to AQE flips that only manifest at
    sf0.1 runtime statistics (the round-8/9 pagerank oscillation). The
    close-out bench already records plan-determined metrics per key and
    diffs them against the newest committed round artifact
    (bench.py _fingerprint_diff); this test turns that diff from
    post-hoc archaeology into a red test: any key whose stage count or
    shuffle/input bytes moved beyond the envelope tolerances — or that
    appeared/disappeared — must carry a reasoned entry in
    tests/plan_allowlist.json. Sub-tolerance byte jitter (compression,
    retry re-fetches) passes without an entry."""
    if not BENCH_LOCAL.exists():
        pytest.skip("no BENCH_local.json close-out artifact on this tree")
    art = json.loads(BENCH_LOCAL.read_text())
    if art.get("only"):
        pytest.skip("BENCH_local.json is a filtered run, not a close-out")
    fd = art.get("fingerprint_diff") or {}
    if not fd.get("baseline"):
        pytest.skip("no committed BENCH_local_r{N}.json baseline to diff")
    assert "error" not in fd, f"baseline {fd['baseline']} unreadable"
    allowed = json.loads(ALLOWLIST.read_text())["allowed"]
    violations: dict[str, dict] = {}
    for key, diffs in fd.get("changed", {}).items():
        if key in allowed:
            continue
        if "new_key" in diffs or "removed_key" in diffs:
            violations[key] = diffs
            continue
        bad = {}
        for f, (prev, cur) in diffs.items():
            if f == "n_stages":
                if abs(cur - prev) > max(3, round(prev * 0.10)):
                    bad[f] = [prev, cur]
            elif not (prev * 0.75 - 1 <= cur <= prev * 1.25 + 1):
                bad[f] = [prev, cur]
        if bad:
            violations[key] = bad
    assert not violations, (
        f"bench-scale plan flip vs {fd['baseline']}: {violations} — if "
        "intentional, add the key with a reason to tests/plan_allowlist.json"
    )
