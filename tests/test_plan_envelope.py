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
Streaming keys get per-key overrides recorded in the envelope file:
their stage/byte counts are partly SCHEDULING-determined (the
micro-batch count varies with trigger timing and box load — observed
248 vs 294 stages for identical code), so their band is wider; it still
catches a strategy flip, which moves volumes by far more than batching
jitter.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from tools.plan_envelopes import SF_DIR, TOP_KEYS, measure

ENVELOPES = Path(__file__).parent / "plan_envelopes.json"


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
