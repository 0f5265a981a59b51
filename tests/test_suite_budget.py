"""Suite time budget (VERDICT r4 next #7): the full suite must stay under
BUDGET_S at the committed baseline. Every collected test is charged its
snapshot duration (tests/durations_snapshot.json, refreshed with
tools/update_test_durations.py); tests absent from the snapshot are charged
NEW_TEST_DEFAULT_S — so adding tests without refreshing the snapshot still
moves the estimate, and growth is visible per-round instead of drifting
(r3 asked <=18 min, r4 measured 24:10 without noticing)."""

import json
import os

import pytest

BUDGET_S = 1200.0  # 20 minutes at the current single-core baseline
NEW_TEST_DEFAULT_S = 5.0
SNAPSHOT = os.path.join(os.path.dirname(__file__), "durations_snapshot.json")


def test_suite_time_budget(request):
    with open(SNAPSHOT) as f:
        snap = json.load(f)["durations"]
    items = [it.nodeid for it in request.session.items]
    if len(items) < 0.8 * len(snap):
        pytest.skip("partial run (-k/-x selection): budget guard only "
                    "meaningful on a full collection")
    est = sum(snap.get(tid, NEW_TEST_DEFAULT_S) for tid in items)
    new = [tid for tid in items if tid not in snap]
    assert est <= BUDGET_S, (
        f"estimated suite time {est:.0f}s exceeds the {BUDGET_S:.0f}s budget "
        f"({len(new)} tests not in the snapshot, charged "
        f"{NEW_TEST_DEFAULT_S}s each: {new[:5]}...). Either slim the slow "
        "tests or refresh tests/durations_snapshot.json "
        "(tools/update_test_durations.py) and re-justify the budget.")
