"""End-to-end invocation of the gradient_check CLI (VERDICT r1 item 10).

Runs the CLI at the reference's shrunken sizes (N=8, H=2) on dubins.yaml and
machine-checks what the reference only eyeballs (gradient_check.py:66-75): the FD
column and the analytic column (jax.grad through the differentiable closed loop,
exact-Hessian mode) must agree in sign and magnitude.

Tolerance rationale: FD here differentiates the ALGORITHM (line-search plateaus,
tol-truncated solves — measured: FD varies ±50% across eps and can hit exact-0
plateaus), while the analytic column is the exact derivative of the solution map
(pinned to a dense reduced-KKT oracle in test_gradients.py). Sign + factor-2 is the
strongest property FD can certify through a closed loop; component-level exactness
is covered by the oracle test.
"""
import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_gradient_check_cli_fd_vs_analytic(tmp_path):
    out = tmp_path / "gc.json"
    env = dict(os.environ)
    # --platform cpu: hermetic against TPU-tunnel outages (the axon backend
    # HANGS on init when the tunnel is down) and deterministic across hosts
    res = subprocess.run(
        [sys.executable, "gradient_check.py", "--config", "configs/dubins.yaml",
         "--platform", "cpu", "--json-out", str(out)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    r = json.loads(out.read_text())
    fd, an = r["fd_dL_dQ0"], r["analytic_dL_dQ0"]
    assert an is not None
    assert fd != 0.0 and an != 0.0
    assert (fd < 0) == (an < 0), f"sign mismatch: fd={fd}, analytic={an}"
    ratio = abs(an / fd)
    assert 0.5 <= ratio <= 2.0, f"magnitude mismatch: fd={fd}, analytic={an}"
