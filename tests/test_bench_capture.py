"""bench.py capture discipline — the driver artifact must be un-losable
(VERDICT r2 weak #1: BENCH_r02.json died to a tunnel drop AFTER the headline
was measured). The reference bench always emits its result struct
(`tools/core/bench_result.h:81-95`); these tests pin the same guarantee:

- rc == 0 and a parsed JSON line on the happy path,
- rc == 0 and the measured headline (with detail.late_error) when the
  process dies AFTER the headline phase,
- rc == 0 and a stale/zero fallback line when it dies BEFORE the headline,
- `_device_phase` retries transient phase errors and degrades to a detail
  field (never raises) when attempts are exhausted.

Runs bench.py as a subprocess on the CPU backend with a tiny corpus
(BENCH_N) — no TPU, no tunnel.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

# force the CPU backend before the axon sitecustomize pins the tunnel:
# jax honors JAX_PLATFORMS at first backend init inside the subprocess
_DRIVER = (
    "import jax; jax.config.update('jax_platforms','cpu'); "
    "import runpy; runpy.run_path(%r, run_name='__main__')" % BENCH
)


def run_bench(tmp_path, n=2048, extra_env=None, timeout=600):
    env = dict(os.environ)
    env.update(
        {
            "BENCH_N": str(n),
            "BENCH_DIR": str(tmp_path / "bench_col"),
            "BENCH_STATE": str(tmp_path / "state.json"),
            "BENCH_FRESH": "1",
            "BENCH_TUNNEL_WAIT_S": "1",
        }
    )
    env.pop("BENCH_10M", None)
    env.update(extra_env or {})
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
        env=env,
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    parsed = json.loads(lines[-1]) if lines else None
    return proc, parsed


@pytest.mark.slow
def test_happy_path_emits_parsed_headline(tmp_path):
    proc, parsed = run_bench(tmp_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert parsed is not None, proc.stdout
    assert parsed["unit"] == "qps"
    assert parsed["value"] > 0
    assert parsed["detail"].get("oracle_ok") is True
    assert "2048" in parsed["metric"]


@pytest.mark.slow
def test_crash_after_headline_still_emits_measured_value(tmp_path):
    """A hard death AFTER the headline phase must still produce rc=0 and
    the real measured number (the exact round-2 failure shape)."""
    proc, parsed = run_bench(
        tmp_path, extra_env={"BENCH_CRASH_AFTER": "api_sequential"}
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert parsed is not None, proc.stdout
    assert parsed["value"] > 0  # the measured headline, not a fallback
    assert "injected crash" in parsed["detail"].get("late_error", "")


@pytest.mark.slow
def test_crash_before_headline_emits_fallback_not_nothing(tmp_path):
    """Death before any headline exists must still emit a parsed line
    (stale fallback), never an empty artifact with rc != 0."""
    proc, parsed = run_bench(
        tmp_path, extra_env={"BENCH_CRASH_AFTER": "collection_build"}
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert parsed is not None, proc.stdout
    assert parsed["detail"].get("stale") is True


def test_device_phase_retries_then_succeeds():
    sys.path.insert(0, REPO)
    import importlib

    bench = importlib.import_module("bench")
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient tunnel drop")
        return 41

    old_wait = bench._wait_for_device
    bench._wait_for_device = lambda: True
    try:
        detail = {}
        assert bench._device_phase("x", flaky, detail, attempts=3) == 41
        assert "x_error" not in detail
        assert calls["n"] == 3
    finally:
        bench._wait_for_device = old_wait


def test_device_phase_exhausts_and_degrades():
    sys.path.insert(0, REPO)
    import importlib

    bench = importlib.import_module("bench")

    def always_fails():
        raise RuntimeError("hard down")

    old_wait = bench._wait_for_device
    bench._wait_for_device = lambda: True
    try:
        detail = {}
        assert bench._device_phase("y", always_fails, detail, attempts=2) is None
        assert "hard down" in detail["y_error"]
    finally:
        bench._wait_for_device = old_wait
