"""utils/profiling smoke: Timer phases, annotate, and jax.profiler trace capture."""
import os

import jax
import jax.numpy as jnp

from tube_mpc_tpu.utils.profiling import Timer, annotate, trace


def test_timer_phases_and_report():
    timer = Timer()
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones(8)
    with timer.phase("compile", sync=None):
        y = f(x)
    with timer.phase("steady", sync=y):
        y = f(x)
    with timer.phase("steady", sync=y):
        y = f(x)
    assert timer.counts == {"compile": 1, "steady": 2}
    rep = timer.report()
    assert "compile" in rep and "steady" in rep and "n=2" in rep


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        with annotate("phase_under_test"):
            jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones(4)))
    # a TensorBoard-loadable trace dir appears
    found = []
    for root, _, files in os.walk(d):
        found += [os.path.join(root, f) for f in files]
    assert found, f"no trace files written under {d}"
