"""Parallel-scan (associative) Riccati: O(log N)-depth backward pass and delta-rollout.

The reference's Riccati recursion is a sequential Python loop (``core/ddp.py:213-254``)
and our default TPU form is a compiled `lax.scan` (solvers/ilqr.py). Both are O(N)
*depth*. This module reformulates the LQ backward pass as an associative composition of
span elements so `jax.lax.associative_scan` evaluates it in O(log N) depth — the
TPU-native answer for LONG horizons or small scenario batches, where the sequential
scan leaves the chip idle. (For large batches at N<=200 the sequential scan is already
compute-bound; this is an opt-in via ``ILQRConfig.horizon_parallel``.)

Formulation (standard parallel LQT algebra, cf. Sarkka & Garcia-Fernandez,
"Temporal parallelization of dynamic programming", derived here from the Pontryagin
two-point boundary-value form with general cross terms):

A span [i, j] of the LQ problem, with all controls inside eliminated by exact
minimization, induces the linear relations

    x_j      = A x_i + b - C lam_j
    lam_i    = J x_i - eta + A^T lam_j

where lam is the costate. One step k (dynamics dx+ = A_k dx + B_k du, stage cost
lx.dx + lu.du + 1/2 dx.lxx.dx + 1/2 du.luu.du + du.lux.dx) gives, with
H = luu^{-1}:

    A_e = A_k - B_k H lux          C_e = B_k H B_k^T
    J_e = lxx - lux^T H lux        b_e = -B_k H lu
    eta_e = lux^T H lu - lx

The terminal condition lam_N = phi_xx x_N + phi_x is the last element
(A=0, b=0, C=0, J=phi_xx, eta=-phi_x). Composition of span1=[i,m] with span2=[m,j]
(eliminating x_m, lam_m; M = (I + C1 J2)^{-1}):

    A = A2 M A1
    b = A2 M (b1 + C1 eta2) + b2
    C = A2 M C1 A2^T + C2
    J = J1 + A1^T J2 M A1                      (J2 M = M^T J2, push-through)
    eta = eta1 + A1^T M^T (eta2 - J2 b1)

This is associative. Suffix compositions E_k = e_k o ... o e_N give the value
function at every k simultaneously: V_xx_k = J(E_k), V_x_k = -eta(E_k); the gains are
then horizon-PARALLEL functions of (step data, V_{k+1}) with the same regularized
solve as the sequential path (``ddp.py:236-246``).

Semantics note: the sequential reference propagates the value with the SPLIT update
(K from the regularized Q_uu solve, quadratic forms with the unregularized Q_uu,
``ddp.py:240-253``); exact elimination here differs from it by O(reg) = O(1e-6).
Gains returned at the end use the identical regularized solve, so for reg -> 0 the
two backward passes coincide (tests assert agreement to ~1e-5 on f64).

The affine closed-loop delta-rollout of the sensitivity sweep (``ddp.py:412-425``)
is likewise an associative composition of affine maps; `parallel_affine_rollout`
evaluates it in O(log N) depth.

Measured reality check (benchmarks/bench_pscan.py --headline, TPU v5e, f32,
nx=4, nu=2, N=50, scan-amortized on-device timing — the earlier direct-call
numbers measured the ~25 us tunnel-dispatch floor, not device time): the
associative form costs a measured ~3x FLOPs and runs 6.4x / 10.4x SLOWER than
the sequential scan at B=1024 / B=16384 (the log-level gather/scatter stages
are HBM-bound on top of the FLOP premium); it WINS only in the latency niche —
0.89x at B=64, and 1.2x single-problem at N>=256. It is therefore an opt-in
(``ILQRConfig.horizon_parallel``) for latency-critical small batches, never the
throughput path; docs/PERFORMANCE.md round-5 section has the decisive table.
Equivalence is guaranteed by tests/test_pscan.py.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.linalg import solve_spd


class SpanElement(NamedTuple):
    """Conditional-value-function span: x_j = A x_i + b - C lam_j;
    lam_i = J x_i - eta + A^T lam_j."""

    A: Array    # [..., n, n]
    b: Array    # [..., n]
    C: Array    # [..., n, n]
    J: Array    # [..., n, n]
    eta: Array  # [..., n]


def inv_small(A: Array) -> Array:
    """Closed-form (adjugate/cofactor) inverse for n<=4, batched over leading dims.

    `jnp.linalg.solve`/`inv` lower to LU-with-pivoting on TPU — while-loops and
    dynamic slices that run ~10-30x slower than the surrounding algebra at these
    matrix sizes (measured, benchmarks/bench_pscan.py --headline). The combine's
    (I + C1 J2) is well-conditioned for LQ spans with regularized elimination,
    so the explicit cofactor form is both faster and adequate; n>4 falls back
    to the generic solve."""
    n = A.shape[-1]
    if n > 4:
        eye = jnp.eye(n, dtype=A.dtype)
        return jnp.linalg.solve(A, jnp.broadcast_to(eye, A.shape))
    a = lambda i, j: A[..., i, j]
    if n == 1:
        return 1.0 / A
    if n == 2:
        det = a(0, 0) * a(1, 1) - a(0, 1) * a(1, 0)
        adj = jnp.stack([
            jnp.stack([a(1, 1), -a(0, 1)], axis=-1),
            jnp.stack([-a(1, 0), a(0, 0)], axis=-1),
        ], axis=-2)
        return adj / det[..., None, None]
    if n == 3:
        c00 = a(1, 1) * a(2, 2) - a(1, 2) * a(2, 1)
        c01 = a(1, 2) * a(2, 0) - a(1, 0) * a(2, 2)
        c02 = a(1, 0) * a(2, 1) - a(1, 1) * a(2, 0)
        det = a(0, 0) * c00 + a(0, 1) * c01 + a(0, 2) * c02
        adj = jnp.stack([
            jnp.stack([c00,
                       a(0, 2) * a(2, 1) - a(0, 1) * a(2, 2),
                       a(0, 1) * a(1, 2) - a(0, 2) * a(1, 1)], axis=-1),
            jnp.stack([c01,
                       a(0, 0) * a(2, 2) - a(0, 2) * a(2, 0),
                       a(0, 2) * a(1, 0) - a(0, 0) * a(1, 2)], axis=-1),
            jnp.stack([c02,
                       a(0, 1) * a(2, 0) - a(0, 0) * a(2, 1),
                       a(0, 0) * a(1, 1) - a(0, 1) * a(1, 0)], axis=-1),
        ], axis=-2)
        return adj / det[..., None, None]
    # n == 4: Laplace expansion by 2x2 complementary minors
    s0 = a(0, 0) * a(1, 1) - a(1, 0) * a(0, 1)
    s1 = a(0, 0) * a(1, 2) - a(1, 0) * a(0, 2)
    s2 = a(0, 0) * a(1, 3) - a(1, 0) * a(0, 3)
    s3 = a(0, 1) * a(1, 2) - a(1, 1) * a(0, 2)
    s4 = a(0, 1) * a(1, 3) - a(1, 1) * a(0, 3)
    s5 = a(0, 2) * a(1, 3) - a(1, 2) * a(0, 3)
    c5 = a(2, 2) * a(3, 3) - a(3, 2) * a(2, 3)
    c4 = a(2, 1) * a(3, 3) - a(3, 1) * a(2, 3)
    c3 = a(2, 1) * a(3, 2) - a(3, 1) * a(2, 2)
    c2 = a(2, 0) * a(3, 3) - a(3, 0) * a(2, 3)
    c1 = a(2, 0) * a(3, 2) - a(3, 0) * a(2, 2)
    c0 = a(2, 0) * a(3, 1) - a(3, 0) * a(2, 1)
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    rows = [
        [a(1, 1) * c5 - a(1, 2) * c4 + a(1, 3) * c3,
         -a(0, 1) * c5 + a(0, 2) * c4 - a(0, 3) * c3,
         a(3, 1) * s5 - a(3, 2) * s4 + a(3, 3) * s3,
         -a(2, 1) * s5 + a(2, 2) * s4 - a(2, 3) * s3],
        [-a(1, 0) * c5 + a(1, 2) * c2 - a(1, 3) * c1,
         a(0, 0) * c5 - a(0, 2) * c2 + a(0, 3) * c1,
         -a(3, 0) * s5 + a(3, 2) * s2 - a(3, 3) * s1,
         a(2, 0) * s5 - a(2, 2) * s2 + a(2, 3) * s1],
        [a(1, 0) * c4 - a(1, 1) * c2 + a(1, 3) * c0,
         -a(0, 0) * c4 + a(0, 1) * c2 - a(0, 3) * c0,
         a(3, 0) * s4 - a(3, 1) * s2 + a(3, 3) * s0,
         -a(2, 0) * s4 + a(2, 1) * s2 - a(2, 3) * s0],
        [-a(1, 0) * c3 + a(1, 1) * c1 - a(1, 2) * c0,
         a(0, 0) * c3 - a(0, 1) * c1 + a(0, 2) * c0,
         -a(3, 0) * s3 + a(3, 1) * s1 - a(3, 2) * s0,
         a(2, 0) * s3 - a(2, 1) * s1 + a(2, 2) * s0],
    ]
    adj = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    return adj / det[..., None, None]


def _combine_chrono(e1: SpanElement, e2: SpanElement) -> SpanElement:
    """Compose span e1=[i,m] with the LATER span e2=[m,j]."""
    n = e1.A.shape[-1]
    eye = jnp.eye(n, dtype=e1.A.dtype)
    M = inv_small(eye + e1.C @ e2.J)  # (I + C1 J2)^{-1}
    A2M = e2.A @ M
    A = A2M @ e1.A
    C1_eta2 = (e1.C @ e2.eta[..., None])[..., 0]
    b = (A2M @ (e1.b + C1_eta2)[..., None])[..., 0] + e2.b
    C = A2M @ e1.C @ jnp.swapaxes(e2.A, -1, -2) + e2.C
    J2M = e2.J @ M  # equals M^T J2
    J = e1.J + jnp.swapaxes(e1.A, -1, -2) @ J2M @ e1.A
    eta = e1.eta + (
        jnp.swapaxes(M @ e1.A, -1, -2) @ (e2.eta - (e2.J @ e1.b[..., None])[..., 0])[..., None]
    )[..., 0]
    return SpanElement(A=A, b=b, C=C, J=J, eta=eta)


def _combine_rev(later: SpanElement, earlier: SpanElement) -> SpanElement:
    """Combiner for a time-REVERSED element sequence (suffix products)."""
    return _combine_chrono(earlier, later)


def riccati_value_sweep(
    A: Array, B: Array,
    lx: Array, lu: Array, lxx: Array, luu: Array, lux: Array,
    phi_x: Array, phi_xx: Array,
    *, elem_reg: float = 0.0,
) -> Tuple[Array, Array]:
    """All value-function pairs (V_x [N+1,n], V_xx [N+1,n,n]) in O(log N) depth.

    elem_reg is added to luu for the exact-elimination elements (invertibility guard);
    it plays the role of the sequential pass's Q_uu regularizer up to O(reg).
    """
    H_lu, H_lux, BH = _eliminate(B, lu, luu, lux, elem_reg)
    A_e = A - B @ H_lux                                   # [N, n, n]
    C_e = BH @ jnp.swapaxes(B, -1, -2)                    # [N, n, n]
    J_e = lxx - jnp.swapaxes(lux, -1, -2) @ H_lux         # [N, n, n]
    b_e = -(BH @ lu[..., None])[..., 0]                   # [N, n]
    eta_e = (jnp.swapaxes(lux, -1, -2) @ H_lu[..., None])[..., 0] - lx

    n = A.shape[-1]
    zero_m = jnp.zeros((1, n, n), dtype=A.dtype)
    zero_v = jnp.zeros((1, n), dtype=A.dtype)
    elems = SpanElement(
        A=jnp.concatenate([A_e, zero_m], axis=0),
        b=jnp.concatenate([b_e, zero_v], axis=0),
        C=jnp.concatenate([C_e, zero_m], axis=0),
        J=jnp.concatenate([J_e, phi_xx[None]], axis=0),
        eta=jnp.concatenate([eta_e, -phi_x[None]], axis=0),
    )
    # Suffix products E_k = e_k o ... o e_N via a prefix scan over the reversed sequence.
    rev = jax.tree.map(lambda a: jnp.flip(a, axis=0), elems)
    suf_rev = jax.lax.associative_scan(_combine_rev, rev, axis=0)
    suf = jax.tree.map(lambda a: jnp.flip(a, axis=0), suf_rev)
    return -suf.eta, suf.J  # V_x [N+1, n], V_xx [N+1, n, n]


def _eliminate(B, lu, luu, lux, elem_reg: float):
    nu = B.shape[-1]
    eye = jnp.eye(nu, dtype=B.dtype)
    luu_r = luu + elem_reg * eye
    H_lu = solve_spd(luu_r, lu)           # [N, nu]
    H_lux = solve_spd(luu_r, lux)         # [N, nu, n]
    inv_luu = solve_spd(luu_r, jnp.broadcast_to(eye, luu_r.shape))
    BH = B @ inv_luu                      # [N, n, nu]
    return H_lu, H_lux, BH


def parallel_backward_pass(
    A: Array, B: Array,
    lx: Array, lu: Array, lxx: Array, luu: Array, lux: Array,
    phi_x: Array, phi_xx: Array, reg: float,
) -> Tuple[Array, Array]:
    """Drop-in replacement for the sequential Riccati `_backward_pass`:
    returns gains (K [N,nu,nx], kff [N,nu]) with the reference's regularized solve
    (``ddp.py:236-246``), but in O(log N) depth."""
    V_x, V_xx = riccati_value_sweep(
        A, B, lx, lu, lxx, luu, lux, phi_x, phi_xx, elem_reg=reg
    )
    Vp_x, Vp_xx = V_x[1:], V_xx[1:]  # V_{k+1} for each k, horizon-parallel
    nu = B.shape[-1]
    eye = jnp.eye(nu, dtype=B.dtype)
    Bt = jnp.swapaxes(B, -1, -2)
    Q_u = lu + (Bt @ Vp_x[..., None])[..., 0]
    Q_ux = lux + Bt @ Vp_xx @ A
    Q_uu = luu + Bt @ Vp_xx @ B
    Q_uu_reg = Q_uu + reg * eye
    K = -solve_spd(Q_uu_reg, Q_ux)
    kff = -solve_spd(Q_uu_reg, Q_u)
    return K, kff


class AffineElement(NamedTuple):
    """x_{k+1} = F x_k + c, composed associatively."""

    F: Array  # [..., n, n]
    c: Array  # [..., n]


def _affine_combine(e1: AffineElement, e2: AffineElement) -> AffineElement:
    """e2 AFTER e1 (chronological prefix products)."""
    return AffineElement(F=e2.F @ e1.F, c=(e2.F @ e1.c[..., None])[..., 0] + e2.c)


def parallel_affine_rollout(F: Array, c: Array, x0: Array) -> Array:
    """X [N+1, n] with x_{k+1} = F_k x_k + c_k, in O(log N) depth.

    The closed-loop delta-rollout of the sensitivity sweep (``ddp.py:412-425``) has
    exactly this form with F_k = A_k + B_k K_k and c_k = B_k kff_k (masked)."""
    pre = jax.lax.associative_scan(_affine_combine, AffineElement(F=F, c=c), axis=0)
    X_tail = (pre.F @ x0[..., None])[..., 0] + pre.c
    return jnp.concatenate([x0[None], X_tail], axis=0)
