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


def test_emitted_line_fits_driver_tail_window():
    """VERDICT r3 weak #1: the driver keeps a 2,000-char stdout tail; the
    BENCH_r03 line was 2,401 bytes and the headline fields (at the START of
    the line) were truncated off. The emitted line must stay under 1,900
    bytes and parse, no matter how fat RESULT.detail gets."""
    sys.path.insert(0, REPO)
    import importlib

    bench = importlib.import_module("bench")
    fat_detail = {
        "oracle_ok": True,
        "recall": 1.0,
        "batch": 1024,
        "baseline_source": "reference_cpp x16 threads",
        "baseline_qps": 108.83,
        "api_sequential_qps": 8331.9,
        "query_p50_ms": 51.4,
        "query_p99_ms": 171.21,
        "kernel_qps_1M": 33787.3,
        # the round-3 payloads that blew the budget:
        "hnsw_10M_collection_api": {
            "n": 10_000_000,
            "insert_secs": 507.3,
            "build_secs": 4383.5,
            "ef": {
                str(ef): {
                    "recall_at_10": 0.85 + ef / 2000,
                    "qps": 1357.8 - ef,
                    "qps_pipelined": 1553.8 - ef,
                }
                for ef in (32, 64, 96, 128, 256)
            },
        },
        "suite_configs": {f"cfg_{i}": {"blob": "x" * 400} for i in range(8)},
    }
    result = {
        "metric": "exact_search_qps_at_recall1.0_1M_128d_top10_public_api",
        "value": 9818.7,
        "unit": "qps",
        "vs_baseline": 90.25,
        "detail": fat_detail,
    }
    line = bench._compact_result(result)
    assert len(line) < 1900, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == 9818.7
    assert parsed["vs_baseline"] == 90.25
    assert parsed["unit"] == "qps"
    # the 10M north star must survive compaction (best >=0.95 recall row)
    ns = parsed["detail"]["hnsw_10M_north_star"]
    assert ns["recall_at_10"] >= 0.95
    assert ns["ef"] in (96, 128, 256)
    # pathological: even a megabyte of detail cannot push headline out
    result["detail"] = {"error": "x" * 1_000_000}
    line = bench._compact_result(result)
    assert len(line) < 1900
    assert json.loads(line)["value"] == 9818.7


def test_subprocess_line_is_bounded(tmp_path):
    proc, parsed = run_bench(tmp_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines and len(lines[-1]) < 1900, len(lines[-1]) if lines else 0
    assert parsed["value"] > 0
