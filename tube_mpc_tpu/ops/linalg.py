"""Small-matrix linear algebra tuned for the tube-MPC regime (nu ∈ {1,2}, nx̂ ≤ ~13).

TPU-first replacements for the reference's ``torch.linalg.solve`` calls
(``core/ddp.py:243-244``) and its dynamic-index active-set solve
(``core/ddp.py:23-60``):

- ``solve_spd``: closed-form adjugate inverses for n ∈ {1, 2} — a handful of fused
  VPU ops instead of a batched LAPACK-style solve, and fully vmap/shard friendly —
  with ``jnp.linalg.solve`` for larger n (static dispatch on shape).
- ``masked_reduced_solve``: static-shape active-set elimination. Instead of gathering
  free indices (dynamic shapes, illegal under jit), rows/cols of active dims are
  replaced by identity and the RHS zeroed, which reproduces the reference semantics
  exactly: X[active] = 0, X[free] = A_ff^{-1} B_f, and the all-active case returns 0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def range_guard_default(dtype) -> bool:
    """Whether intermediates must stay inside the f32 exponent range (~3.4e38).

    True for every dtype narrower than float64, and for float64 on TPU, where x64 is
    EMULATED with f32 exponent range. False only for real float64 backends (CPU/GPU),
    which is exactly the reference-agreement oracle mode — there the solve must follow
    ``torch.linalg.solve`` semantics (plain LU, no resolve-or-zero guard), because the
    reference solves degenerate Q_uu and lets the line search reject garbage
    (``/root/reference/core/ddp.py:243-244``). Static at trace time.

    Caveat: the dispatch reads ``jax.default_backend()`` at TRACE time, not the
    device the computation is ultimately committed to — a CPU-committed f64 solve
    inside a TPU-default process would take the scale-invariant guard path. Oracle
    runs must therefore force ``JAX_PLATFORMS=cpu`` process-wide (all tools/ scripts
    do), or pass ``range_guard`` explicitly at the call sites that accept it.
    """
    if jnp.dtype(dtype) != jnp.dtype(jnp.float64):
        return True
    return jax.default_backend() == "tpu"


def _lu_solve_2x2(A: Array, B: Array) -> Array:
    """2x2 LU solve with partial pivoting — the LAPACK ``dgesv`` operation sequence.

    ``torch.linalg.solve`` on CPU f64 is LAPACK getrf/getrs; for n=2 that is: pick the
    larger-|.|-magnitude first-column entry as pivot (strict >, first-wins ties, like
    idamax), eliminate, back-substitute. Reproducing the same op sequence keeps the
    f64 oracle path bit-close to the reference even at near-singular knife edges,
    where adjugate-determinant rounding and LU rounding part ways.
    """
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    swap = jnp.abs(c) > jnp.abs(a)
    p00 = jnp.where(swap, c, a)
    p01 = jnp.where(swap, d, b)
    p10 = jnp.where(swap, a, c)
    p11 = jnp.where(swap, b, d)
    b0 = jnp.where(swap[..., None], B[..., 1, :], B[..., 0, :])
    b1 = jnp.where(swap[..., None], B[..., 0, :], B[..., 1, :])
    # EXACT zero pivots or non-finite entries mean a truly singular / overflowed
    # system — torch.linalg.solve errors or returns NaN there, poisoning the whole
    # run. Return X = 0 instead (the solver keeps its incumbent trajectory). Any
    # system with nonzero pivots — however ill-conditioned — takes the pure LU
    # path, which is what the teacher-forced f64 agreement relies on.
    finite = jnp.isfinite(a) & jnp.isfinite(b) & jnp.isfinite(c) & jnp.isfinite(d)
    l = p10 / jnp.where(p00 == 0.0, 1.0, p00)
    u11 = p11 - l * p01
    ok = finite & (p00 != 0.0) & (u11 != 0.0)
    u11 = jnp.where(u11 == 0.0, 1.0, u11)
    p00 = jnp.where(p00 == 0.0, 1.0, p00)
    x1 = (b1 - l[..., None] * b0) / u11[..., None]
    x0 = (b0 - p01[..., None] * x1) / p00[..., None]
    X = jnp.stack([x0, x1], axis=-2)
    return jnp.where(ok[..., None, None], X, 0.0)


def solve_spd(A: Array, B: Array) -> Array:
    """Solve A X = B for (regularized) SPD A. A [..., n, n]; B [..., n] or [..., n, m].

    Dispatch is static: on range-limited dtypes (f32, TPU-emulated f64) the 2x2 case
    uses the scale-invariant resolve-or-zero adjugate below; on real f64 it uses the
    torch-faithful LU path (see ``range_guard_default``).
    """
    n = A.shape[-1]
    vec = B.ndim == A.ndim - 1
    if vec:
        B = B[..., None]
    if n == 1:
        X = B / A[..., :1, :]
    elif n == 2 and not range_guard_default(A.dtype):
        X = _lu_solve_2x2(A, B)
    elif n == 2:
        a, b = A[..., 0, 0], A[..., 0, 1]
        c, d = A[..., 1, 0], A[..., 1, 1]
        # Scale-invariant adjugate solve. TPU x64 is EMULATED with f32 exponent range
        # (~1e38): barrier-inflated Hessians reach ~1e22, so a raw determinant (~1e44)
        # overflows to inf -> NaN gains on TPU while CPU f64 (1e308) sails through.
        # Normalizing by the max entry keeps every intermediate within range.
        s = jnp.maximum(jnp.maximum(jnp.abs(a), jnp.abs(b)),
                        jnp.maximum(jnp.abs(c), jnp.abs(d)))
        s = jnp.maximum(s, jnp.asarray(1e-30, dtype=A.dtype))
        a, b, c, d = a / s, b / s, c / s, d / s
        det = a * d - b * c
        # Resolve-or-zero: a barrier-dominated Q_uu is numerically rank-1 — the true
        # regularizer sits below the cancellation noise of a*d - b*c, so the
        # normalized det is rounding garbage (and cancels to EXACTLY 0 on
        # TPU-emulated f64). Gains computed from such a det are meaningless at this
        # precision and their magnitude (1/det) overflows the downstream K'QuuK
        # value update on range-limited TPU floats. Where det is below ~100 ulps we
        # return X = 0 (the solver keeps its incumbent trajectory — a graceful
        # stall, like the reference's line-search rejection of garbage candidates).
        # Identity for any resolvable solve (normalized det >> 100*eps).
        # |det|: a resolvable INDEFINITE system (det < 0) is a legitimate solve the
        # reference performs (torch.linalg.solve); only unresolvable magnitudes zero.
        ok = jnp.abs(det) > 100.0 * jnp.finfo(A.dtype).eps
        safe_det = jnp.where(ok, det, jnp.ones_like(det))
        inv_det = jnp.where(ok, 1.0, 0.0) / (safe_det * s)
        x0 = (d[..., None] * B[..., 0, :] - b[..., None] * B[..., 1, :]) * inv_det[..., None]
        x1 = (-c[..., None] * B[..., 0, :] + a[..., None] * B[..., 1, :]) * inv_det[..., None]
        X = jnp.where(ok[..., None, None], jnp.stack([x0, x1], axis=-2), 0.0)
    else:
        X = jnp.linalg.solve(A, B)
    return X[..., 0] if vec else X


def masked_reduced_solve(A: Array, B: Array, active: Array) -> Array:
    """Active-set reduced solve with static shapes (reference ``ddp.py:23-60``).

    Args:
      A: [..., n, n] regularized SPD matrix.
      B: [..., n] or [..., n, m] RHS.
      active: [..., n] boolean; True = dimension clamped at a bound (δ = 0).
    Returns:
      X with X[active] = 0 and X[free] solving the free-free subsystem.
    """
    free = (~active).astype(A.dtype)            # [..., n]
    # Zero active rows/cols, put 1 on active diagonal: solving gives X[active] = 0.
    A_masked = A * free[..., :, None] * free[..., None, :] + _diag_embed(active.astype(A.dtype))
    vec = B.ndim == A.ndim - 1
    Bm = B * free if vec else B * free[..., :, None]
    return solve_spd(A_masked, Bm)


def _diag_embed(v: Array) -> Array:
    """[..., n] -> [..., n, n] with v on the diagonal (batched)."""
    n = v.shape[-1]
    return v[..., :, None] * jnp.eye(n, dtype=v.dtype)


def regularize(H: Array, reg: float) -> Array:
    """H + reg * I, batched (reference ``utils.py:42-52``)."""
    return H + reg * jnp.eye(H.shape[-1], dtype=H.dtype)
