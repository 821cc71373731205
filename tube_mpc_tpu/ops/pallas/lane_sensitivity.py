"""Lane-major fused DDP sensitivity + closed-form Algorithm-2 gradient kernels.

Measured motivation: in the lane closed loop the two warm-started iLQR solves
converge in a few iterations, and the per-step bottleneck became the VMAPPED
feature-last XLA sensitivity sweep — ~68 ms of a ~77 ms step at B=8192 (HBM-tiled
4x4 matrices again, the same 64x density loss the lane solver removed). These
kernels run the O(T) delta-z sweeps in the same [component-row, B-lanes] layout as
ops/pallas/lane_solver.py:

  K_sbwd — backward recursion on (V_xx, tV_x) with active-set elimination
           (reference ``ddp.py:360-410``; masked semantics of
           ops/linalg.masked_reduced_solve: rows/cols of clamped dims -> identity,
           so K/kff are exactly zero there), upper gradient
           g_x = 2 (x - x_ref) built in-kernel (the tube upper loss
           L = ||x* - x_bar||^2 + ||b*||^2), g_u = 0. Scaled V carry + scale-
           invariant resolve-or-zero inverses as in the solver kernels.
  K_sfwd — forward delta-rollout delta_x+ = A dx + B dv, dv = kff + K dx
           (reference ``ddp.py:412-425``), FUSED with the closed-form weight
           gradient accumulation (reference ``tube_mpc.py:963-976``):
             gQ_i  = sum_k 2 (x_k - xref_k)_i dx_k_i   (incl. terminal; Qf == Q)
             gqb   = sum_k 2 b_k db_k                  (incl. terminal)
             gR_a  = sum_k 2 (u_k - uref_k)_a dv_k_a
           accumulated per lane in revisited output rows; delta_lambda is never
           materialized (the closed-form gradients don't need it).

The const-row layout C and the LaneProblem are shared with lane_solver.py.
Equivalence vs the vmapped XLA path (solvers/sensitivity.py +
solvers/weight_grads.py) is pinned in tests/test_lane_sensitivity.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dbas import BarrierParams
from ..lanes import jac_rows
from .lane_solver import LaneProblem, _bp_from_C, _pad_lanes

_V_SCALE_THRESH = 1e8


def _sbwd_kernel(pb: LaneProblem, reg: float, active_tol: float, generic: bool,
                 custom_upper: bool, *refs):
    """Backward δz sweep. custom_upper=True replaces the in-kernel tube upper
    gradient (g_x = 2(x - x_ref), g_u = 0) with CALLER-SUPPLIED per-step rows —
    the coupled-bilevel chain feeds the nominal problem the aux solve's
    reference-cotangents this way (reference ``tube_mpc.py:516-559``)."""
    nh, m = pb.n_hat, pb.m
    refs = list(refs)
    if custom_upper:
        gX_ref = refs.pop(0)   # [1, nh, B] upper grad rows at k
        gU_ref = refs.pop(0)   # [1, m, B]
        gXN_ref = refs.pop(0)  # [nh, B] terminal upper grad rows
    if generic:
        (U_ref, X_ref, Xr_ref, C_ref, XN_ref, XrN_ref,
         K_out, kff_out, tVx_out, Vxx_out, LogS_out, Vxx, tVx, LogS) = refs
    else:
        (U_ref, X_ref, Xr_ref, C_ref, XN_ref, XrN_ref,
         K_out, kff_out, Vxx, tVx, LogS) = refs
    kidx = pl.program_id(1)

    @pl.when(kidx == 0)
    def _init():
        # V_xx(N) = terminal Hessian diag; tV_x(N) = g_x(N)
        for i in range(nh):
            if custom_upper:
                tVx[i, :] = gXN_ref[i, :]
            else:
                tVx[i, :] = 2.0 * (XN_ref[i, :] - XrN_ref[i, :])
            for j in range(nh):
                Vxx[i * nh + j, :] = jnp.where(i == j, C_ref[nh + m + i, :], 0.0)
        LogS[0, :] = jnp.zeros_like(LogS[0, :])

    if generic:
        # emit the CARRY-IN (the value function at k+1, in its scaled representation)
        # at block index k: the generic forward sweep reconstructs
        # δλ_{k+1} = exp(LogS)·(tV_x(k+1) + V_xx(k+1) δx_{k+1}) for the
        # dynamics-parameter IFT term Σ_k δλ_{k+1}ᵀ ∂f̂/∂(α,γ).
        for i in range(nh):
            tVx_out[0, i, :] = tVx[i, :]
            for j in range(nh):
                Vxx_out[0, i * nh + j, :] = Vxx[i * nh + j, :]
        LogS_out[0, 0, :] = LogS[0, :]

    inv_s = jnp.exp(-LogS[0, :])

    # fused in-kernel linearization (see lane_solver._ric_kernel)
    xs = tuple(X_ref[0, i, :] for i in range(nh))
    us = [U_ref[0, a, :] for a in range(m)]
    bp = _bp_from_C(pb, C_ref)
    A, Bm = jac_rows(lambda xx, uu: pb.f_hat(xx, uu, bp), xs, tuple(us))
    if custom_upper:
        gx = [gX_ref[0, i, :] * inv_s for i in range(nh)]
        gu = [gU_ref[0, a, :] * inv_s for a in range(m)]
    else:
        gx = [2.0 * (xs[i] - Xr_ref[0, i, :]) * inv_s for i in range(nh)]
    vxx = [[Vxx[i * nh + j, :] for j in range(nh)] for i in range(nh)]
    tv = [tVx[i, :] for i in range(nh)]

    VA = [[sum(vxx[i][l] * A[l][j] for l in range(nh)) for j in range(nh)] for i in range(nh)]
    VB = [[sum(vxx[i][l] * Bm[l][a] for l in range(nh)) for a in range(m)] for i in range(nh)]
    Qxx = [[(C_ref[i, :] * inv_s if i == j else 0.0) + sum(A[l][i] * VA[l][j] for l in range(nh))
            for j in range(nh)] for i in range(nh)]
    Qxu = [[sum(A[l][i] * VB[l][a] for l in range(nh)) for a in range(m)] for i in range(nh)]
    Qux = [[sum(Bm[l][a] * VA[l][i] for l in range(nh)) for i in range(nh)] for a in range(m)]
    Quu = [[(C_ref[nh + a, :] * inv_s if a == b else 0.0) + sum(Bm[l][a] * VB[l][b] for l in range(nh))
            for b in range(m)] for a in range(m)]
    tQu = [(gu[a] if custom_upper else 0.0) + sum(Bm[l][a] * tv[l] for l in range(nh))
           for a in range(m)]
    tQx = [gx[i] + sum(A[l][i] * tv[l] for l in range(nh)) for i in range(nh)]
    regs = reg * inv_s

    # active-set elimination (reference control.py:66-70 + masked_reduced_solve)
    am = [jnp.where((us[a] <= pb.u_min[a] + active_tol) | (us[a] >= pb.u_max[a] - active_tol),
                    0.0, 1.0) for a in range(m)]
    act = [1.0 - am[a] for a in range(m)]
    Qm = [[(Quu[a][b] + (regs if a == b else 0.0)) * am[a] * am[b] + (act[a] if a == b else 0.0)
           for b in range(m)] for a in range(m)]
    Qux_m = [[Qux[a][i] * am[a] for i in range(nh)] for a in range(m)]
    tQu_m = [tQu[a] * am[a] for a in range(m)]

    if m == 1:
        inv = [[1.0 / Qm[0][0]]]
    elif m == 2:
        q00, q01, q10, q11 = Qm[0][0], Qm[0][1], Qm[1][0], Qm[1][1]
        s = jnp.maximum(jnp.maximum(jnp.abs(q00), jnp.abs(q01)),
                        jnp.maximum(jnp.abs(q10), jnp.abs(q11)))
        s = jnp.maximum(s, jnp.finfo(q00.dtype).tiny)
        n00, n01, n10, n11 = q00 / s, q01 / s, q10 / s, q11 / s
        det = n00 * n11 - n01 * n10
        ok = jnp.abs(det) > 100.0 * jnp.finfo(q00.dtype).eps  # see ops/linalg.py
        safe_det = jnp.where(ok, det, jnp.ones_like(det))
        det_inv = jnp.where(ok, 1.0, 0.0) / (safe_det * s)
        inv = [[n11 * det_inv, -n01 * det_inv], [-n10 * det_inv, n00 * det_inv]]
    else:  # pragma: no cover
        raise NotImplementedError("lane sensitivity supports nu in {1, 2}")

    K = [[-sum(inv[a][b] * Qux_m[b][i] for b in range(m)) for i in range(nh)] for a in range(m)]
    kf = [-sum(inv[a][b] * tQu_m[b] for b in range(m)) for a in range(m)]

    for a in range(m):
        kff_out[0, a, :] = kf[a]
        for i in range(nh):
            K_out[0, a * nh + i, :] = K[a][i]

    tv_new = [tQx[i] + sum(Qxu[i][a] * kf[a] for a in range(m)) for i in range(nh)]
    vxx_new = [[Qxx[i][j] + sum(Qxu[i][a] * K[a][j] for a in range(m)) for j in range(nh)]
               for i in range(nh)]

    mmax = jnp.zeros_like(tv_new[0])
    for i in range(nh):
        mmax = jnp.maximum(mmax, jnp.abs(tv_new[i]))
        for j in range(nh):
            mmax = jnp.maximum(mmax, jnp.abs(vxx_new[i][j]))
    scale_inv = jnp.where(mmax > _V_SCALE_THRESH, _V_SCALE_THRESH / mmax, 1.0)
    def _safe(v):  # NaN-scrub, see lane_solver._ric_kernel
        v = v * scale_inv
        return jnp.where(jnp.isfinite(v.astype(jnp.float32)), v, 0.0)
    for i in range(nh):
        tVx[i, :] = _safe(tv_new[i])
        for j in range(nh):
            Vxx[i * nh + j, :] = _safe(vxx_new[i][j])
    LogS[0, :] = LogS[0, :] - jnp.log(jnp.maximum(scale_inv, jnp.finfo(scale_inv.dtype).tiny))


def _sfwd_kernel(pb: LaneProblem, n_steps: int, generic: bool, emit_ref_grads: bool,
                 *refs):
    """Forward δ-rollout + gradient accumulation. emit_ref_grads additionally emits
    the per-step REFERENCE-COTANGENTS of the tracking cost — g_Xref_k = -2Q ⊙ δx_k,
    g_Uref_k = -2R ⊙ δv_k, terminal -2Qf ⊙ δx_N — i.e. ∂L/∂(X_ref, U_ref) by the
    IFT accumulation, which the coupled bilevel chain feeds to the NOMINAL sweep as
    its upper gradients (reference ``tube_mpc.py:505-559``)."""
    nh, m = pb.n_hat, pb.m
    refs = list(refs)
    if generic and emit_ref_grads:
        # kernel ref order is (*ins, *outs, *scratches): the dx scratch is LAST,
        # the three ref-cotangent outputs sit just before it
        dx_scratch = refs.pop()
        gxrN_out = refs.pop()     # [nh, B] terminal ref-cotangent (fixed block)
        gur_out = refs.pop()      # [1, m, B] at k
        gxr_out = refs.pop()      # [1, nh, B] at k
        refs.append(dx_scratch)
    if generic:
        (K_ref, kff_ref, X_ref, Xr_ref, U_ref, Ur_ref, C_ref, XN_ref, XrN_ref,
         tVx_ref, Vxx_ref, LogS_ref,
         gx_out, gr_out, gxt_out, gdyn_out, dx_scr) = refs
    else:
        (K_ref, kff_ref, X_ref, Xr_ref, U_ref, Ur_ref, C_ref, XN_ref, XrN_ref,
         gx_out, gr_out, dx_scr) = refs
    kidx = pl.program_id(1)

    @pl.when(kidx == 0)
    def _init():
        for i in range(nh):
            dx_scr[i, :] = jnp.zeros_like(dx_scr[i, :])
        gx_out[:, :] = jnp.zeros_like(gx_out)
        gr_out[:, :] = jnp.zeros_like(gr_out)
        if generic:
            gxt_out[:, :] = jnp.zeros_like(gxt_out)
            gdyn_out[:, :] = jnp.zeros_like(gdyn_out)
        if generic and emit_ref_grads:
            gxrN_out[:, :] = jnp.zeros_like(gxrN_out)

    K = [[K_ref[0, a * nh + i, :] for i in range(nh)] for a in range(m)]
    kf = [kff_ref[0, a, :] for a in range(m)]
    dx = [dx_scr[i, :] for i in range(nh)]
    xs = tuple(X_ref[0, i, :] for i in range(nh))
    us = tuple(U_ref[0, a, :] for a in range(m))
    bp = _bp_from_C(pb, C_ref)

    dv = [kf[a] + sum(K[a][i] * dx[i] for i in range(nh)) for a in range(m)]
    # stage accumulations at k (dx is delta_x_k, PRE-step)
    for i in range(nh):
        gx_out[i, :] += 2.0 * (xs[i] - Xr_ref[0, i, :]) * dx[i]
    for a in range(m):
        gr_out[a, :] += 2.0 * (us[a] - Ur_ref[0, a, :]) * dv[a]
    if generic and emit_ref_grads:
        # C rows store the DOUBLED weights (2Q, 2R): g_Xref = -2Q δx, g_Uref = -2R δv
        for i in range(nh):
            gxr_out[0, i, :] = -C_ref[i, :] * dx[i]
        for a in range(m):
            gur_out[0, a, :] = -C_ref[nh + a, :] * dv[a]

    # delta_x+ = A dx + B dv as ONE fused JVP of the augmented step — no Jacobian
    # arrays materialized (A/B fed only these sweeps; see lane_solver._ric_kernel).
    _, dx_next = jax.jvp(lambda xx, uu: pb.f_hat(xx, uu, bp),
                         (xs, us), (tuple(dx), tuple(dv)))
    for i in range(nh):
        dx_scr[i, :] = dx_next[i]

    if generic:
        # δλ_{k+1} from the value function emitted by the backward sweep, then the
        # dynamics-parameter IFT terms gα += δλᵀ ∂f̂/∂α, gγ += δλᵀ ∂f̂/∂γ
        # (reference ``ift.py:62-84``'s f_θᵀ δλ_{k+1} term; the stage cost has no
        # α/γ dependence, so this is their whole gradient).
        s_k1 = jnp.exp(LogS_ref[0, 0, :])
        dlam = [
            s_k1 * (tVx_ref[0, i, :]
                    + sum(Vxx_ref[0, i * nh + j, :] * dx_next[j] for j in range(nh)))
            for i in range(nh)
        ]
        one = jnp.ones_like(bp.alpha)

        def f_of_bp(a, g, t):
            return pb.f_hat(xs, us, BarrierParams(alpha=a, gamma=g, tight=t))

        _, f_a = jax.jvp(lambda a: f_of_bp(a, bp.gamma, bp.tight), (bp.alpha,), (one,))
        _, f_g = jax.jvp(lambda g: f_of_bp(bp.alpha, g, bp.tight), (bp.gamma,), (one,))
        _, f_t = jax.jvp(lambda t: f_of_bp(bp.alpha, bp.gamma, t), (bp.tight,), (one,))
        gdyn_out[0, :] += sum(dlam[i] * f_a[i] for i in range(nh))
        gdyn_out[1, :] += sum(dlam[i] * f_g[i] for i in range(nh))
        gdyn_out[2, :] += sum(dlam[i] * f_t[i] for i in range(nh))

    @pl.when(kidx == n_steps - 1)
    def _terminal():
        if generic:
            # terminal split: rows 0..n-1 feed dL/dQf, row n feeds the terminal part
            # of dL/dq_b (stage part accumulates in gx_out)
            for i in range(nh):
                gxt_out[i, :] += 2.0 * (XN_ref[i, :] - XrN_ref[i, :]) * dx_next[i]
            if emit_ref_grads:
                for i in range(nh):
                    gxrN_out[i, :] += -C_ref[nh + m + i, :] * dx_next[i]
        else:
            for i in range(nh):
                gx_out[i, :] += 2.0 * (XN_ref[i, :] - XrN_ref[i, :]) * dx_next[i]


def lane_sensitivity_grads(
    pb: LaneProblem,
    *,
    X: Array,       # [N+1, n̂, B] rows (solved aux trajectory)
    U: Array,       # [N, m, B] rows
    X_ref: Array,   # [N+1, n̂, B] rows (barrier row zero)
    U_ref: Array,   # [N, m, B] rows
    C: Array,       # [nc, B] const rows (current aux weights)
    reg: float = 1e-9,
    active_tol: float = 1e-8,
    block_b: int = 4096,
    interpret: bool = False,
    generic: bool = False,
    emit_ref_grads: bool = False,
    upper_gx: Array = None,    # [N+1, n̂, B] custom upper-gradient rows (else tube L)
    upper_gu: Array = None,    # [N, m, B]
):
    """Fused delta-z sweep + closed-form weight gradients, lane-major.

    generic=False (paper path): returns (gx_rows [n̂, B], gr_rows [m, B]): rows
    0..n-1 of gx_rows are dL/dQ (incl. terminal; Qf tied), row n is dL/dq_b,
    gr_rows is dL/dR — exactly grads_aux_from_deltas on the ddp_sensitivity result
    (parity-tested).

    generic=True (generic path, θ = (Q, R, Qf, qb, α, γ)): returns
    (gx_rows, gr_rows, gxt_rows [n̂, B], gdyn_rows [2, B]) where gx_rows is now
    STAGE-ONLY (rows 0..n-1 → dL/dQ, row n → stage part of dL/dq_b), gxt_rows is
    the terminal split (rows 0..n-1 → dL/dQf, row n → terminal part of dL/dq_b),
    and gdyn_rows = (dL/dα, dL/dγ) via the Σ_k δλ_{k+1}ᵀ ∂f̂/∂θ IFT dynamics term
    (the backward sweep additionally emits its value-function carry per k)."""
    nh, m = pb.n_hat, pb.m
    N = U.shape[0]
    B = U.shape[-1]
    dtype = U.dtype

    # Block width: wide blocks amortize per-grid-step overhead (measured: 512 ->
    # 4096 lanes doubled closed-loop throughput); clamp to the rounded-up lane
    # count so small batches don't pad to a full block.
    Bt = min(block_b, max(128, ((B + 127) // 128) * 128))
    B_pad = ((B + Bt - 1) // Bt) * Bt
    nb = B_pad // Bt
    X = _pad_lanes(X, B_pad)
    U = _pad_lanes(U, B_pad)
    X_ref = _pad_lanes(X_ref, B_pad)
    U_ref = _pad_lanes(U_ref, B_pad)
    C = _pad_lanes(C, B_pad)
    if B_pad != B:
        ones_pad = jnp.concatenate(
            [jnp.zeros((C.shape[0], B), dtype), jnp.ones((C.shape[0], B_pad - B), dtype)], axis=-1
        )
        C = jnp.where(ones_pad > 0, 1.0, C)

    kb = lambda b, k: (k, 0, b)
    kb_rev = lambda b, k: (N - 1 - k, 0, b)
    fixed = lambda b, k: (0, b)

    custom_upper = upper_gx is not None
    if custom_upper:
        upper_gx = _pad_lanes(upper_gx, B_pad)
        upper_gu = _pad_lanes(upper_gu, B_pad)

    bwd_out_specs = [
        pl.BlockSpec((1, m * nh, Bt), kb_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, Bt), kb_rev, memory_space=pltpu.VMEM),
    ]
    bwd_out_shape = [
        jax.ShapeDtypeStruct((N, m * nh, B_pad), dtype),
        jax.ShapeDtypeStruct((N, m, B_pad), dtype),
    ]
    if generic:
        bwd_out_specs += [
            pl.BlockSpec((1, nh, Bt), kb_rev, memory_space=pltpu.VMEM),       # tV_x(k+1)
            pl.BlockSpec((1, nh * nh, Bt), kb_rev, memory_space=pltpu.VMEM),  # V_xx(k+1)
            pl.BlockSpec((1, 1, Bt), kb_rev, memory_space=pltpu.VMEM),        # LogS(k+1)
        ]
        bwd_out_shape += [
            jax.ShapeDtypeStruct((N, nh, B_pad), dtype),
            jax.ShapeDtypeStruct((N, nh * nh, B_pad), dtype),
            jax.ShapeDtypeStruct((N, 1, B_pad), dtype),
        ]

    bwd_in_specs = [
        pl.BlockSpec((1, m, Bt), kb_rev, memory_space=pltpu.VMEM),    # U
        pl.BlockSpec((1, nh, Bt), kb_rev, memory_space=pltpu.VMEM),   # X[:N]
        pl.BlockSpec((1, nh, Bt), kb_rev, memory_space=pltpu.VMEM),   # X_ref[:N]
        pl.BlockSpec((C.shape[0], Bt), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((nh, Bt), fixed, memory_space=pltpu.VMEM),       # X[N]
        pl.BlockSpec((nh, Bt), fixed, memory_space=pltpu.VMEM),       # X_ref[N]
    ]
    bwd_args = [U, X[:-1], X_ref[:-1], C, X[-1], X_ref[-1]]
    if custom_upper:
        # custom rows are popped FIRST in the kernel, so they lead the arg list
        bwd_in_specs = [
            pl.BlockSpec((1, nh, Bt), kb_rev, memory_space=pltpu.VMEM),   # gX[:N]
            pl.BlockSpec((1, m, Bt), kb_rev, memory_space=pltpu.VMEM),    # gU
            pl.BlockSpec((nh, Bt), fixed, memory_space=pltpu.VMEM),       # gX[N]
        ] + bwd_in_specs
        bwd_args = [upper_gx[:-1], upper_gu, upper_gx[-1]] + bwd_args

    sbwd = pl.pallas_call(
        functools.partial(_sbwd_kernel, pb, float(reg), float(active_tol), generic,
                          custom_upper),
        grid=(nb, N),
        in_specs=bwd_in_specs,
        out_specs=bwd_out_specs,
        out_shape=bwd_out_shape,
        scratch_shapes=[
            pltpu.VMEM((nh * nh, Bt), dtype),
            pltpu.VMEM((nh, Bt), dtype),
            pltpu.VMEM((1, Bt), dtype),
        ],
        interpret=interpret,
    )
    bwd_out = sbwd(*bwd_args)
    if generic:
        K, kff, tVx_seq, Vxx_seq, LogS_seq = bwd_out
    else:
        K, kff = bwd_out

    fwd_in_specs = [
        pl.BlockSpec((1, m * nh, Bt), kb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, Bt), kb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nh, Bt), kb, memory_space=pltpu.VMEM),       # X[:N]
        pl.BlockSpec((1, nh, Bt), kb, memory_space=pltpu.VMEM),       # X_ref[:N]
        pl.BlockSpec((1, m, Bt), kb, memory_space=pltpu.VMEM),        # U
        pl.BlockSpec((1, m, Bt), kb, memory_space=pltpu.VMEM),        # U_ref
        pl.BlockSpec((C.shape[0], Bt), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((nh, Bt), fixed, memory_space=pltpu.VMEM),       # X[N]
        pl.BlockSpec((nh, Bt), fixed, memory_space=pltpu.VMEM),       # X_ref[N]
    ]
    fwd_out_specs = [
        pl.BlockSpec((nh, Bt), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((m, Bt), fixed, memory_space=pltpu.VMEM),
    ]
    fwd_out_shape = [
        jax.ShapeDtypeStruct((nh, B_pad), dtype),
        jax.ShapeDtypeStruct((m, B_pad), dtype),
    ]
    fwd_args = [K, kff, X[:-1], X_ref[:-1], U, U_ref, C, X[-1], X_ref[-1]]
    if generic:
        fwd_in_specs += [
            pl.BlockSpec((1, nh, Bt), kb, memory_space=pltpu.VMEM),       # tV_x(k+1)
            pl.BlockSpec((1, nh * nh, Bt), kb, memory_space=pltpu.VMEM),  # V_xx(k+1)
            pl.BlockSpec((1, 1, Bt), kb, memory_space=pltpu.VMEM),        # LogS(k+1)
        ]
        fwd_out_specs += [
            pl.BlockSpec((nh, Bt), fixed, memory_space=pltpu.VMEM),       # terminal split
            pl.BlockSpec((3, Bt), fixed, memory_space=pltpu.VMEM),        # (gα, gγ, gtight)
        ]
        fwd_out_shape += [
            jax.ShapeDtypeStruct((nh, B_pad), dtype),
            jax.ShapeDtypeStruct((3, B_pad), dtype),
        ]
        fwd_args += [tVx_seq, Vxx_seq, LogS_seq]
        if emit_ref_grads:
            fwd_out_specs += [
                pl.BlockSpec((1, nh, Bt), kb, memory_space=pltpu.VMEM),   # g_Xref[:N]
                pl.BlockSpec((1, m, Bt), kb, memory_space=pltpu.VMEM),    # g_Uref
                pl.BlockSpec((nh, Bt), fixed, memory_space=pltpu.VMEM),   # g_Xref[N]
            ]
            fwd_out_shape += [
                jax.ShapeDtypeStruct((N, nh, B_pad), dtype),
                jax.ShapeDtypeStruct((N, m, B_pad), dtype),
                jax.ShapeDtypeStruct((nh, B_pad), dtype),
            ]

    sfwd = pl.pallas_call(
        functools.partial(_sfwd_kernel, pb, N, generic, generic and emit_ref_grads),
        grid=(nb, N),
        in_specs=fwd_in_specs,
        out_specs=fwd_out_specs,
        out_shape=fwd_out_shape,
        scratch_shapes=[pltpu.VMEM((nh, Bt), dtype)],
        interpret=interpret,
    )
    out = sfwd(*fwd_args)
    if generic and emit_ref_grads:
        gx, gr, gxt, gdyn, gxr, gur, gxrN = out
        return (gx[..., :B], gr[..., :B], gxt[..., :B], gdyn[..., :B],
                gxr[..., :B], gur[..., :B], gxrN[..., :B])
    if generic:
        gx, gr, gxt, gdyn = out
        return gx[..., :B], gr[..., :B], gxt[..., :B], gdyn[..., :B]
    gx, gr = out
    return gx[..., :B], gr[..., :B]
