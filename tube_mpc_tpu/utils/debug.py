"""Numerics debugging — the framework's equivalent of the reference's
``debug_numerics`` / ``_ensure_finite`` machinery (``tube_mpc.py:786-801``,
``ddp.py:138-159``) and ``debug_detect_anomaly`` (``run_experiment.py:44-45``).

JAX-native tools:
- `debug_nans(True)`: flips jax_debug_nans/jax_debug_infs so the FIRST op producing a
  non-finite value raises with its location (the anomaly-mode analogue).
- `check_finite_log(pytree)`: post-hoc finite check with a per-leaf diagnostic
  (the _ensure_finite analogue for whole runs — inside jit everything is traced, so
  the reference's per-tensor print-and-raise style is done on fetched outputs).
- `assert_finite(x, name)`: in-graph checkify-style guard via jax.debug.check for use
  inside jitted code when hunting a specific divergence.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def check_finite_log(tree: Any, *, name: str = "log") -> None:
    """Raise FloatingPointError with a located diagnostic if any leaf is non-finite."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in leaves:
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            bad = int((~np.isfinite(a)).sum())
            finite = a[np.isfinite(a)]
            lo = float(finite.min()) if finite.size else float("nan")
            hi = float(finite.max()) if finite.size else float("nan")
            loc = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"[NUMERIC-FAIL] {name}{loc}: {bad} non-finite entries "
                f"(finite range [{lo}, {hi}])"
            )


def located_check(x, phase: str, enabled: bool = True):
    """In-scan located finite guard — the reference's ``_ensure_finite`` threaded
    through every pipeline phase (``tube_mpc.py:786-801``, ``ddp.py:138-159``),
    TPU-native: a ``checkify.check`` that survives jit/scan/vmap and reports the
    FIRST failing phase by name when the caller runs under ``run_checked``.

    Zero compiled cost when ``enabled=False`` (static Python branch); when enabled
    but not checkify-transformed, JAX discards user checks, so the fast path is
    unchanged either way.
    """
    if not enabled:
        return x
    from jax.experimental import checkify

    checkify.check(
        jnp.all(jnp.isfinite(x)),
        f"[NUMERIC-FAIL] non-finite value in {phase} "
        "(reference _ensure_finite semantics; rerun with debug_nans for op-level "
        "location)",
    )
    return x


def run_checked(fn, *args, **kwargs):
    """Execute ``fn`` with located_check guards armed: checkify-transform (user
    checks), run, and throw the first located failure as ``JaxRuntimeError``.
    The closed-loop runners use this when ``debug_numerics`` is on."""
    from jax.experimental import checkify

    err, out = jax.jit(checkify.checkify(fn, errors=checkify.user_checks))(*args, **kwargs)
    err.throw()
    return out


def assert_finite(x, name: str):
    """In-graph finite check (safe under jit/vmap): prints a located diagnostic when a
    non-finite value appears. Use with checkify for hard failure; here we keep the
    computation running (debug_nans(True) gives the hard-raise behavior)."""
    ok = jnp.all(jnp.isfinite(x))
    jax.lax.cond(
        ok,
        lambda: None,
        lambda: jax.debug.print("[NUMERIC-FAIL] non-finite detected in {n}", n=name),
    )
    return x
