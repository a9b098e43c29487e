"""bench.py must emit its one-line JSON even when the device backend wedges.

The axon tunnel has been observed to hang backend init indefinitely; the
driver's round-end bench run must then record an error JSON, not nothing
(see bench.py's watchdog).  These run bench.py as a subprocess the way the
driver does.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_extra, timeout):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the child off the TPU plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )


def test_backend_watchdog_emits_error_json():
    """A backend that never comes up (simulated with a ~0s deadline) still
    produces exactly one parseable JSON line with the contract fields."""
    out = _run_bench({"BENCH_BACKEND_WATCHDOG_S": "0.01"}, timeout=120)
    assert out.returncode == 2, (out.stdout, out.stderr)
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "gibbs_sweeps_per_sec_muse_30x30x600"
    assert rec["value"] == 0 and rec["vs_baseline"] == 0
    assert "backend init" in rec["error"]


def test_total_watchdog_emits_error_json():
    """A run that exceeds the total budget (tiny here; the CPU bench takes
    minutes) reports the device-stall error.  The backend deadline is kept
    generous — the total budget is anchored at process start, so it fires
    right after backend-up regardless of how slow the imports were."""
    out = _run_bench(
        {"BENCH_BACKEND_WATCHDOG_S": "120", "BENCH_WATCHDOG_S": "10"},
        timeout=300,
    )
    assert out.returncode == 2, (out.stdout, out.stderr)
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert "did not finish" in rec["error"]
