#!/usr/bin/env python
"""Refresh tests/durations_snapshot.json from a pytest run (VERDICT r4 next
#7: the suite needs a time budget with per-round visibility instead of
unbounded drift).

Usage:
  python -m pytest tests/ -q --durations=0 -vv 2>&1 | tee /tmp/durations.txt
  python tools/update_test_durations.py /tmp/durations.txt

Parses the `slowest durations` block (call/setup/teardown rows) into
{test_id: seconds}, sums per test id, and writes the committed snapshot
tests/test_suite_budget.py guards against.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse(path: str) -> dict:
    rows = {}
    pat = re.compile(r"^\s*(\d+\.\d+)s\s+(call|setup|teardown)\s+(tests/\S+)")
    with open(path) as f:
        for line in f:
            m = pat.match(line)
            if m:
                secs, _, tid = m.groups()
                rows[tid] = round(rows.get(tid, 0.0) + float(secs), 2)
    return rows


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/durations.txt"
    rows = parse(src)
    if not rows:
        raise SystemExit(f"no duration rows parsed from {src} "
                         "(run pytest with --durations=0 -vv)")
    out = os.path.join(REPO, "tests", "durations_snapshot.json")
    with open(out, "w") as f:
        json.dump({"total_s": round(sum(rows.values()), 1),
                   "n_tests": len(rows),
                   "durations": dict(sorted(rows.items(),
                                            key=lambda kv: -kv[1]))},
                  f, indent=1)
    print(f"wrote {out}: {len(rows)} tests, {sum(rows.values()):.0f}s total")


if __name__ == "__main__":
    main()
