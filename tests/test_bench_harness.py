"""bench.py failure-path hardening (VERDICT r3 weak #1).

Round 3's official perf capture was an rc=1 traceback: the axon backend
failed init AND the recovery path crashed (old bench.py:181). The driver
needs ONE parseable JSON line on stdout no matter what — dead tunnel,
in-run exception, or wedge — always keyed by the SAME metric string
(ADVICE r3: the watchdog used a different name than the success path).
"""

import json
import subprocess
import sys

import pytest

import bench


def _last_json_line(out: str) -> dict:
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in output: {out!r}"
    return json.loads(lines[-1])


def test_probe_failure_emits_error_json(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_backend", lambda: "tunnel dead (test)")
    bench.main()
    rec = _last_json_line(capsys.readouterr().out)
    assert rec["metric"] == bench.HEADLINE_METRIC
    assert rec["value"] == 0.0
    assert "tunnel dead (test)" in rec["error"]


def test_run_exception_emits_error_json(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_backend", lambda: None)

    def boom():
        raise RuntimeError("mid-bench explosion")

    monkeypatch.setattr(bench, "_run", boom)
    bench.main()
    rec = _last_json_line(capsys.readouterr().out)
    assert rec["metric"] == bench.HEADLINE_METRIC
    assert rec["value"] == 0.0
    assert "mid-bench explosion" in rec["error"]


def test_watchdog_uses_headline_metric():
    """ADVICE r3: the deadman-timer payload must key by the same metric
    string as the success path, else the driver can't associate the error
    record with the benchmark. Checked statically — the watchdog payload is
    built from HEADLINE_METRIC, so assert no other metric literal remains."""
    src = open(bench.__file__).read()
    assert src.count('"metric": HEADLINE_METRIC') >= 2  # watchdog + error
    assert '"metric": "ddim100' not in src


def test_probe_failing_subprocess(monkeypatch):
    """A probe whose subprocess exits nonzero returns the error tail and
    retries per the delay schedule without raising."""
    monkeypatch.setattr(bench, "_PROBE_CODE",
                        "import sys; sys.stderr.write('no backend'); "
                        "sys.exit(1)")
    err = bench._probe_backend(attempt_delays=(0, 0))
    assert err is not None and "no backend" in err


def test_probe_hanging_subprocess(monkeypatch):
    """A hung probe (dead tunnel: jax.devices() blocks forever) is bounded
    by the subprocess timeout, not trusted to return."""
    monkeypatch.setattr(bench, "_PROBE_CODE", "import time; time.sleep(60)")
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "2")
    err = bench._probe_backend(attempt_delays=(0,))
    assert err is not None and "hung" in err


def test_probe_success(monkeypatch):
    monkeypatch.setattr(bench, "_PROBE_CODE", "print('cpu')")
    assert bench._probe_backend(attempt_delays=(0,)) is None
