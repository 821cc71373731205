"""bench.py must ALWAYS emit one parseable JSON line (round-3 post-mortem:
a tunnel outage at the driver's one-shot capture left the round with rc=1 and
an unparseable tail). Three failure surfaces are guarded:

  1. backend probe failure  -> error line             (probe retry exhaust)
  2. hang AFTER the probe   -> watchdog error line    (tunnel death mid-run)
  3. healthy run            -> metric line            (slow tier; needs compile)
"""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_over, timeout):
    env = dict(os.environ)
    env.update(env_over)
    r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       capture_output=True, text=True, cwd=ROOT,
                       env=env, timeout=timeout)
    assert r.returncode == 0, r.stderr[-500:]
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_watchdog_hang_after_probe_still_emits_json():
    # a 1-second watchdog fires during compile — stands in for a backend that
    # hangs after a healthy probe (the one hole rc-resilience had left)
    out = _run_bench({"BENCH_PLATFORM": "cpu", "BENCH_PATH": "xla",
                      "BENCH_B": "2", "BENCH_H": "2",
                      "BENCH_WATCHDOG_S": "1"}, timeout=420)
    assert out["value"] is None
    assert "watchdog" in out["error"]


def test_probe_failure_emits_json():
    # an unimportable platform makes the probe subprocess fail fast
    out = _run_bench({"BENCH_PLATFORM": "no_such_platform",
                      "BENCH_PROBE_ATTEMPTS": "1",
                      "BENCH_PROBE_TIMEOUT_S": "120"}, timeout=420)
    assert out["value"] is None
    assert "backend_unavailable" in out["error"]


@pytest.mark.slow
def test_healthy_cpu_run_emits_metric():
    out = _run_bench({"BENCH_PLATFORM": "cpu", "BENCH_PATH": "xla",
                      "BENCH_B": "2", "BENCH_H": "2", "BENCH_REPEATS": "1"},
                     timeout=560)
    assert out["value"] and out["value"] > 0
    assert out["unit"] == "solves/s"
    assert "error" not in out


def test_battery_aborts_without_touching_docs():
    # tools/bench_battery.py must refuse to rewrite docs/numbers.json when a
    # bench mode fails (backend down): exit 1, docs byte-identical
    nums_path = os.path.join(ROOT, "docs", "numbers.json")
    with open(nums_path, "rb") as f:
        before = f.read()
    env = dict(os.environ)
    env.update({"BENCH_PLATFORM": "no_such_platform",
                "BENCH_PROBE_ATTEMPTS": "1", "BENCH_PROBE_TIMEOUT_S": "120"})
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "bench_battery.py"),
         "--skip-compaction", "--repeats", "1"],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=420)
    assert r.returncode == 1, r.stdout[-300:]
    assert "ABORT" in r.stdout
    with open(nums_path, "rb") as f:
        assert f.read() == before


def test_bench_system_guards_unsupported_mode():
    # BENCH_SYSTEM families run only the paper lane path; any other combination
    # must emit the one-line JSON error (never a traceback tail)
    out = _run_bench({"BENCH_SYSTEM": "cartpole", "BENCH_MODE": "generic",
                      "BENCH_PLATFORM": "cpu"}, timeout=420)
    assert out["value"] is None
    assert "BENCH_SYSTEM" in out["error"]


def test_bench_system_unknown_family_emits_json():
    out = _run_bench({"BENCH_SYSTEM": "warp_drive", "BENCH_PLATFORM": "cpu"},
                     timeout=420)
    assert out["value"] is None
    assert out.get("error")


@pytest.mark.slow
def test_bench_n_flows_into_workload_and_metric():
    # BENCH_N parameterizes the planning horizon (PERFORMANCE.md scaling
    # profile); the metric name records it so artifacts are self-describing.
    out = _run_bench({"BENCH_PLATFORM": "cpu", "BENCH_PATH": "xla",
                      "BENCH_B": "2", "BENCH_H": "2", "BENCH_N": "8",
                      "BENCH_REPEATS": "1"}, timeout=560)
    assert out["value"] and out["value"] > 0
    assert out["metric"].endswith("_T8")
