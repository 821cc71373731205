"""Fused Riccati backward sweep as a Pallas TPU kernel (SURVEY.md §2a item 1).

The tube-MPC regime is thousands of tiny (nx̂≤8, nu≤2) Riccati recursions in parallel:
exactly the shape XLA's generic batched path handles worst (a sequential loop of many
small fused ops, each paying loop/dispatch overhead) and a Pallas kernel handles best.

Design:
- layout: batch on the LANES. Every matrix element is a [B]-vector; A is stored
  [N, n*n, B], so each row is a lane-aligned vector register and every matrix algebra
  step is an unrolled elementwise multiply-add on the VPU. No MXU — at n=4 the
  systolic array cannot be fed; the VPU over 128+ lanes is the speed-of-light path.
- grid = (B/Bt, N): TPU grid dims execute sequentially, so the k-dimension IS the
  backward recursion; the value-function state (V_x, V_xx) lives in VMEM scratch and
  carries across grid steps, re-initialized from (φ_x, φ_xx) when the k-index wraps.
  Per-k operand blocks stream HBM→VMEM with the implicit double-buffered pipeline.
- the nu×nu solve is a closed-form adjugate inverse (nu ∈ {1, 2}), elementwise over
  lanes.

Semantics match solvers/ilqr._backward_pass (reference ``core/ddp.py:213-254``) and
are tested against it elementwise.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _riccati_kernel(n: int, m: int, reg: float,
                    A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
                    phix_ref, phixx_ref,
                    K_ref, kff_ref, Vx, Vxx):
    kidx = pl.program_id(1)

    @pl.when(kidx == 0)
    def _init():
        Vx[:] = phix_ref[:]
        Vxx[:] = phixx_ref[:]

    # Load per-k operands as python lists of [B]-lane rows (everything unrolled).
    A = [[A_ref[0, i * n + j, :] for j in range(n)] for i in range(n)]
    Bm = [[B_ref[0, i * m + a, :] for a in range(m)] for i in range(n)]
    lx = [lx_ref[0, i, :] for i in range(n)]
    lu = [lu_ref[0, a, :] for a in range(m)]
    lxx = [[lxx_ref[0, i * n + j, :] for j in range(n)] for i in range(n)]
    luu = [[luu_ref[0, a * m + b, :] for b in range(m)] for a in range(m)]
    lux = [[lux_ref[0, a * n + i, :] for i in range(n)] for a in range(m)]
    vx = [Vx[i, :] for i in range(n)]
    vxx = [[Vxx[i * n + j, :] for j in range(n)] for i in range(n)]

    # Q_x = l_x + Aᵀ V_x ; Q_u = l_u + Bᵀ V_x
    Qx = [lx[i] + sum(A[j][i] * vx[j] for j in range(n)) for i in range(n)]
    Qu = [lu[a] + sum(Bm[j][a] * vx[j] for j in range(n)) for a in range(m)]

    # VA = V_xx A ; VB = V_xx B
    VA = [[sum(vxx[i][l] * A[l][j] for l in range(n)) for j in range(n)] for i in range(n)]
    VB = [[sum(vxx[i][l] * Bm[l][a] for l in range(n)) for a in range(m)] for i in range(n)]

    # Q_xx = l_xx + Aᵀ V_xx A ; Q_ux = l_ux + Bᵀ V_xx A ; Q_uu = l_uu + Bᵀ V_xx B
    Qxx = [[lxx[i][j] + sum(A[l][i] * VA[l][j] for l in range(n)) for j in range(n)]
           for i in range(n)]
    Qux = [[lux[a][i] + sum(Bm[l][a] * VA[l][i] for l in range(n)) for i in range(n)]
           for a in range(m)]
    Quu = [[luu[a][b] + sum(Bm[l][a] * VB[l][b] for l in range(n)) for b in range(m)]
           for a in range(m)]

    # closed-form inverse of Q_uu + reg I (m in {1, 2})
    if m == 1:
        inv = [[1.0 / (Quu[0][0] + reg)]]
    elif m == 2:
        q00 = Quu[0][0] + reg
        q11 = Quu[1][1] + reg
        q01, q10 = Quu[0][1], Quu[1][0]
        # scale-invariant adjugate inverse (TPU f32 / emulated-f64 exponent range:
        # raw determinants of barrier-inflated Q_uu overflow; see ops/linalg.py)
        s = jnp.maximum(jnp.maximum(jnp.abs(q00), jnp.abs(q01)),
                        jnp.maximum(jnp.abs(q10), jnp.abs(q11)))
        s = jnp.maximum(s, jnp.finfo(q00.dtype).tiny)
        n00, n01, n10, n11 = q00 / s, q01 / s, q10 / s, q11 / s
        det = n00 * n11 - n01 * n10
        # resolve-or-zero (see ops/linalg.py): below ~100 ulps of |det| the solve is
        # rounding garbage and 1/det-scale gains overflow the K'QuuK update on TPU
        # floats; zero gains = graceful stall on the incumbent trajectory. Resolvable
        # indefinite systems (det < 0) are solved sign-preserved, like the reference.
        ok = jnp.abs(det) > 100.0 * jnp.finfo(q00.dtype).eps
        safe_det = jnp.where(ok, det, jnp.ones_like(det))
        det_inv = jnp.where(ok, 1.0, 0.0) / (safe_det * s)
        inv = [[n11 * det_inv, -n01 * det_inv], [-n10 * det_inv, n00 * det_inv]]
    else:  # pragma: no cover — wrapper guards this
        raise NotImplementedError("pallas riccati kernel supports nu in {1, 2}")

    # K = -inv @ Q_ux ; kff = -inv @ Q_u
    K = [[-sum(inv[a][b] * Qux[b][i] for b in range(m)) for i in range(n)] for a in range(m)]
    kf = [-sum(inv[a][b] * Qu[b] for b in range(m)) for a in range(m)]

    for a in range(m):
        kff_ref[0, a, :] = kf[a]
        for i in range(n):
            K_ref[0, a * n + i, :] = K[a][i]

    # V_x  = Q_x + Kᵀ Q_uu kff + Kᵀ Q_u + Q_uxᵀ kff
    # V_xx = Q_xx + Kᵀ Q_uu K + Kᵀ Q_ux + Q_uxᵀ K     (reference ddp.py:251-252)
    Quu_k = [sum(Quu[a][b] * kf[b] for b in range(m)) for a in range(m)]
    vx_new = [
        Qx[i]
        + sum(K[a][i] * Quu_k[a] for a in range(m))
        + sum(K[a][i] * Qu[a] for a in range(m))
        + sum(Qux[a][i] * kf[a] for a in range(m))
        for i in range(n)
    ]
    QuuK = [[sum(Quu[a][b] * K[b][j] for b in range(m)) for j in range(n)] for a in range(m)]
    for i in range(n):
        Vx[i, :] = vx_new[i]
    for i in range(n):
        for j in range(n):
            Vxx[i * n + j, :] = (
                Qxx[i][j]
                + sum(K[a][i] * QuuK[a][j] for a in range(m))
                + sum(K[a][i] * Qux[a][j] for a in range(m))
                + sum(Qux[a][i] * K[a][j] for a in range(m))
            )


def riccati_sweep_pallas(
    A: Array,      # [B, N, n, n]
    Bm: Array,     # [B, N, n, m]
    lx: Array,     # [B, N, n]
    lu: Array,     # [B, N, m]
    lxx: Array,    # [B, N, n, n]
    luu: Array,    # [B, N, m, m]
    lux: Array,    # [B, N, m, n]
    phix: Array,   # [B, n]
    phixx: Array,  # [B, n, n]
    *,
    reg: float,
    block_b: int = 256,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Batched fused backward sweep -> (K [B, N, m, n], kff [B, N, m])."""
    B, N, n, _ = A.shape
    m = Bm.shape[-1]
    if m not in (1, 2):
        raise NotImplementedError("pallas riccati kernel supports nu in {1, 2}")
    dtype = A.dtype

    # pad batch to a lane-aligned multiple
    Bt = min(block_b, max(128, 128))
    B_pad = ((B + Bt - 1) // Bt) * Bt
    pad = B_pad - B

    def to_lanes(x, rows):
        # [B, N, ...] -> [N, rows, B_pad]
        x = x.reshape(B, N, rows)
        x = jnp.moveaxis(x, 0, -1)          # [N, rows, B]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        return x

    def to_lanes2(x, rows):
        # [B, ...] -> [rows, B_pad]
        x = x.reshape(B, rows)
        x = jnp.moveaxis(x, 0, -1)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        return x

    args = (
        to_lanes(A, n * n),
        to_lanes(Bm, n * m),
        to_lanes(lx, n),
        to_lanes(lu, m),
        to_lanes(lxx, n * n),
        to_lanes(luu, m * m),
        to_lanes(lux, m * n),
        to_lanes2(phix, n),
        to_lanes2(phixx, n * n),
    )

    nb = B_pad // Bt
    # identity-padded Q_uu on padding lanes would be singular-free because luu pads
    # to 0 and reg > 0 keeps det = reg^2 > 0; padding lanes produce garbage K that we
    # slice away.
    grid = (nb, N)

    def k_rev(b, k):
        return (N - 1 - k, 0, b)

    def k_rev_out(b, k):
        return (N - 1 - k, 0, b)

    def fixed(b, k):
        return (0, b)

    in_specs = [
        pl.BlockSpec((1, n * n, Bt), k_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n * m, Bt), k_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, Bt), k_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, Bt), k_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n * n, Bt), k_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m * m, Bt), k_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m * n, Bt), k_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((n, Bt), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((n * n, Bt), fixed, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, m * n, Bt), k_rev_out, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, Bt), k_rev_out, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, m * n, B_pad), dtype),
        jax.ShapeDtypeStruct((N, m, B_pad), dtype),
    ]

    K_l, kff_l = pl.pallas_call(
        functools.partial(_riccati_kernel, n, m, float(reg)),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, Bt), dtype),
            pltpu.VMEM((n * n, Bt), dtype),
        ],
        interpret=interpret,
    )(*args)

    # back to [B, N, ...]
    K = jnp.moveaxis(K_l[..., :B], -1, 0).reshape(B, N, m, n)
    kff = jnp.moveaxis(kff_l[..., :B], -1, 0).reshape(B, N, m)
    return K, kff
