"""Checkpoint/resume for long closed-loop runs and sharded sweeps.

The reference persists end-of-run only (``tube_mpc.py:1025-1047``); mid-run state is
lost on failure (SURVEY.md §5 checkpoint: none). Here the closed loop executes in
segments of `segment_len` steps — each segment one jitted scan — and the full carry
state (x, b, x̄, b̄, warm starts, θ, momentum) plus the accumulated logs are persisted
after every segment, so a killed run resumes bit-exactly at the last segment boundary.

Format: flat .npz per checkpoint (leaf path -> array) — transparent, dependency-free,
and pytree-faithful via tree_flatten_with_path. Disturbances for the whole run are
derived up front from the seed, so resume consumes the identical noise stream.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tube.closed_loop import ClosedLoopLog, make_paper_step, paper_init_state


def _flatten(tree) -> dict:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in leaves}


def _unflatten(template, flat: dict):
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in paths_leaves:
        k = jax.tree_util.keystr(path)
        if k not in flat:
            raise KeyError(f"checkpoint missing leaf {k}")
        new_leaves.append(jnp.asarray(flat[k], dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_state(path: str, state, *, step: int, extra: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(state)
    np.savez(path, __step__=np.asarray(step), **flat)
    if extra is not None:
        with open(path + ".meta.json", "w", encoding="utf-8") as f:
            json.dump(extra, f)


def load_state(path: str, template) -> Tuple[Any, int]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files if k != "__step__"}
        step = int(z["__step__"])
    return _unflatten(template, flat), step


def _logs_path(state_path: str) -> str:
    """Companion logs file for a state checkpoint — substitute on the BASENAME only
    (a ckpt_dir whose ancestors contain 'state_' must not be rewritten)."""
    d, base = os.path.split(state_path)
    return os.path.join(d, base.replace("state_", "logs_", 1))


def _run_fingerprint(w, H: int, *, cfg=None, inputs=None) -> dict:
    """Identity of a checkpointed run: shapes + content hashes of the disturbance
    stream, the run-defining config (solver iters/tol, adaptation lr/momentum,
    barrier params, ...), and the run-defining input pytree (initial carry incl.
    θ init, plus fixed references like target/w_nominal). Resuming with any of
    these changed in the same ckpt_dir would silently concatenate inconsistent
    logs; save_state stores this via its extra= hook and resume verifies it."""
    import hashlib

    arr = np.asarray(w)
    fp = {
        "H": int(H),
        "w_shape": list(arr.shape),
        "w_sha1": hashlib.sha1(arr.tobytes()).hexdigest()[:16],
    }
    if cfg is not None:
        # dataclass reprs are deterministic for the scalar/tuple fields configs hold
        fp["cfg_sha1"] = hashlib.sha1(repr(cfg).encode()).hexdigest()[:16]
    if inputs is not None:
        h = hashlib.sha1()
        flat = _flatten(inputs)
        for k in sorted(flat):
            a = np.asarray(flat[k])
            h.update(k.encode())
            h.update(str(a.dtype).encode())
            h.update(str(a.shape).encode())
            h.update(a.tobytes())
        fp["inputs_sha1"] = h.hexdigest()[:16]
    return fp


def _check_fingerprint(ck: str, fp: dict) -> None:
    meta_path = ck + ".meta.json"
    if not os.path.exists(meta_path):
        return  # pre-metadata checkpoint: trust the caller (legacy format)
    with open(meta_path, "r", encoding="utf-8") as f:
        saved = json.load(f)
    if saved != fp:
        raise ValueError(
            f"checkpoint {ck} was written by a different run: saved {saved} vs "
            f"current {fp}. Point ckpt_dir elsewhere or delete the stale checkpoints."
        )


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for f in os.listdir(ckpt_dir):
        m = re.fullmatch(r"state_(\d+)\.npz", f)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(ckpt_dir, f)
    return best


def run_paper_closed_loop_checkpointed(
    system,
    aug,
    cfg,
    *,
    w_nominal,
    aux_init,
    bp,
    x0,
    target,
    key,
    ckpt_dir: str,
    segment_len: int = 50,
) -> ClosedLoopLog:
    """Segmented, resumable version of run_paper_closed_loop.

    Kill/resume is BIT-exact: the full disturbance sequence is generated from `key`
    up front, segments consume slices of it, and the carry is checkpointed at
    segment boundaries, so a resumed run re-executes the same jitted segment program
    on the same inputs. Against the MONOLITHIC scan the results agree to ulp level
    (measured: <= 1 ulp on a few steps — the H-length and segment-length scans
    compile to differently fused programs). If ckpt_dir already holds checkpoints
    for this run, execution resumes after the last one.
    """
    H = cfg.H
    dtype = x0.dtype
    w_seq = system.sample_disturbance(key, (H,), dtype=dtype)

    step = make_paper_step(system, aug, cfg, w_nominal=w_nominal, bp=bp, target=target)

    @jax.jit
    def run_segment(state, w_slice):
        return jax.lax.scan(step, state, w_slice)

    template = paper_init_state(system, aug, cfg, aux_init=aux_init, bp=bp, x0=x0)

    fp = _run_fingerprint(w_seq, H, cfg=cfg,
                          inputs=(template, w_nominal, bp, target))
    start = 0
    state = template
    logs_so_far: list = []
    ck = latest_checkpoint(ckpt_dir)
    if ck is not None:
        _check_fingerprint(ck, fp)
        state, start = load_state(ck, template)
        saved_logs = np.load(_logs_path(ck), allow_pickle=False)
        logs_so_far = [
            ClosedLoopLog(*[jnp.asarray(saved_logs[name]) for name in ClosedLoopLog._fields])
        ]

    t = start
    while t < H:
        seg = min(segment_len, H - t)
        state, logs = run_segment(state, w_seq[t : t + seg])
        logs = ClosedLoopLog(*logs)
        logs_so_far.append(logs)
        t += seg
        merged = ClosedLoopLog(
            *[jnp.concatenate([getattr(l, f) for l in logs_so_far], axis=0) for f in ClosedLoopLog._fields]
        )
        logs_so_far = [merged]
        save_state(os.path.join(ckpt_dir, f"state_{t}.npz"), state, step=t, extra=fp)
        np.savez(
            os.path.join(ckpt_dir, f"logs_{t}.npz"),
            **{f: np.asarray(getattr(merged, f)) for f in ClosedLoopLog._fields},
        )

    return logs_so_far[0]


def run_paper_closed_loop_lanes_checkpointed(
    system,
    aug,
    sys_c,
    cfg,
    *,
    w_nominal,
    aux_init,
    bp,
    x0,
    target,
    key=None,
    w_seqs=None,
    batch=None,
    ckpt_dir: str,
    segment_len: int = 50,
    eps: float = 1e-4,
    barrier_type: str = "inverse",
    population: bool = False,
    block_b: int = 4096,
    interpret: bool = False,
    nom_compact_caps=(),
    aux_compact_caps=(),
) -> ClosedLoopLog:
    """Segmented, resumable version of the BATCHED lane-engine closed loop
    (tube/lane_closed_loop.run_paper_closed_loop_lanes): the full [B, ...] carry —
    every lane's state, warm starts, per-lane θ and momentum — checkpoints at
    segment boundaries, so a killed fleet run resumes bit-exactly. Returns a
    ClosedLoopLog with leading batch dim.

    The reference has no checkpointing at all (SURVEY.md §5); the round-1 build had
    it only for the single-trajectory XLA paper path.
    """
    from ..tube.lane_closed_loop import (
        make_paper_lane_step,
        paper_lane_init_state,
    )
    from ..tube.lane_interface import make_lane_problem

    H = cfg.H
    if w_seqs is None:
        if key is None or batch is None:
            raise ValueError("provide w_seqs or (key, batch)")
        w_seqs = system.sample_disturbance(key, (batch, H), dtype=target.dtype)
    B = w_seqs.shape[0]
    dtype = w_seqs.dtype
    w_tm = jnp.swapaxes(w_seqs, 0, 1)  # [H, B, nx]

    pb = make_lane_problem(sys_c, barrier_type=barrier_type, eps=eps)
    step = make_paper_lane_step(
        system, aug, pb, cfg, w_nominal=w_nominal, bp=bp, target=target,
        B=B, dtype=dtype, population=population, block_b=block_b, interpret=interpret,
        nom_compact_caps=tuple(nom_compact_caps), aux_compact_caps=tuple(aux_compact_caps),
    )

    @jax.jit
    def run_segment(state, w_slice):
        return jax.lax.scan(step, state, w_slice)

    template = paper_lane_init_state(
        system, aug, cfg, aux_init=aux_init, bp=bp, x0=x0, B=B, dtype=dtype,
        population=population,
    )

    fp = _run_fingerprint(w_seqs, H, cfg=cfg,
                          inputs=(template, w_nominal, bp, target))
    start = 0
    state = template
    logs_so_far: list = []
    ck = latest_checkpoint(ckpt_dir)
    if ck is not None:
        _check_fingerprint(ck, fp)
        state, start = load_state(ck, template)
        saved_logs = np.load(_logs_path(ck), allow_pickle=False)
        logs_so_far = [
            ClosedLoopLog(*[jnp.asarray(saved_logs[name]) for name in ClosedLoopLog._fields])
        ]

    t = start
    while t < H:
        seg = min(segment_len, H - t)
        state, logs = run_segment(state, w_tm[t : t + seg])
        logs = ClosedLoopLog(*logs)   # time-major [seg, B, ...]
        logs_so_far.append(logs)
        t += seg
        merged = ClosedLoopLog(
            *[jnp.concatenate([getattr(l, f) for l in logs_so_far], axis=0)
              for f in ClosedLoopLog._fields]
        )
        logs_so_far = [merged]
        save_state(os.path.join(ckpt_dir, f"state_{t}.npz"), state, step=t, extra=fp)
        np.savez(
            os.path.join(ckpt_dir, f"logs_{t}.npz"),
            **{f: np.asarray(getattr(merged, f)) for f in ClosedLoopLog._fields},
        )

    merged = logs_so_far[0]
    # time-major -> batch-major, matching run_paper_closed_loop_lanes
    return ClosedLoopLog(*[jnp.swapaxes(getattr(merged, f), 0, 1)
                           for f in ClosedLoopLog._fields])


def run_paper_closed_loop_lanes_sharded_checkpointed(
    system,
    aug,
    sys_c,
    cfg,
    *,
    w_nominal,
    aux_init,
    bp,
    x0,
    target,
    w_seqs,            # [B, H, nx] global batch
    mesh,
    ckpt_dir: str,
    segment_len: int = 50,
    eps: float = 1e-4,
    barrier_type: str = "inverse",
    population: bool = False,
    block_b: int = 4096,
    interpret: bool = False,
) -> ClosedLoopLog:
    """Segmented, resumable version of the SHARDED flagship lane driver
    (tube/lane_closed_loop.run_paper_closed_loop_lanes_sharded) — the realistic
    deployment shape: a long multi-chip sweep that survives preemption
    (BASELINE.json configs item 5). Each segment is one jitted shard_map'd scan
    over the mesh's scenario axis; at segment boundaries the GLOBAL carry — every
    lane's state and warm starts, per-lane θ (independent mode) or the
    psum-replicated shared θ (population mode) — is gathered to host and
    persisted, so a killed fleet run resumes bit-exactly on the same mesh.
    The fingerprint additionally pins mesh size and population mode: resuming a
    sweep on a different device count would re-shard the lanes (equal to 1e-10
    by the mesh-invariance tests, but not bitwise) and is rejected.

    Returns a ClosedLoopLog with leading batch dim [B, H, ...], equal to the
    monolithic sharded driver (tests/test_lane_mesh.py).
    """
    from jax.sharding import PartitionSpec as P

    from ..tube.lane_closed_loop import (
        make_paper_lane_step,
        paper_lane_init_state,
    )
    from ..tube.lane_interface import make_lane_problem

    H = cfg.H
    B = w_seqs.shape[0]
    n_dev = mesh.size
    if B % n_dev != 0:
        raise ValueError(f"global batch {B} not divisible by mesh size {n_dev}")
    b_local = B // n_dev
    axis = mesh.axis_names[0]
    dtype = w_seqs.dtype
    nx = system.nx
    if x0.ndim == 1:
        x0 = jnp.broadcast_to(x0, (B, nx))

    pb = make_lane_problem(sys_c, barrier_type=barrier_type, eps=eps)
    step = make_paper_lane_step(
        system, aug, pb, cfg, w_nominal=w_nominal, bp=bp, target=target,
        B=b_local, dtype=dtype, population=population, block_b=block_b,
        interpret=interpret, axis_name=axis if population else None,
    )

    # Global-template carry: batch-leading leaves shard over the scenario axis;
    # population-mode shared θ (no batch dim) stays replicated (kept in sync by
    # the in-scan psum, so taking any device's copy at the out barrier is exact).
    template = paper_lane_init_state(
        system, aug, cfg, aux_init=aux_init, bp=bp, x0=x0, B=B, dtype=dtype,
        population=population,
    )
    state_spec = jax.tree.map(
        lambda l: P(axis) if (getattr(l, "ndim", 0) > 0 and l.shape[0] == B) else P(),
        template,
    )

    def seg(state, w_tm_shard):   # w_tm_shard: [seg, b_local, nx]
        return jax.lax.scan(step, state, w_tm_shard)

    run_segment = jax.jit(jax.shard_map(
        seg, mesh=mesh,
        in_specs=(state_spec, P(None, axis)),
        out_specs=(state_spec, P(None, axis)),
        check_vma=False,
    ))

    w_tm = jnp.swapaxes(w_seqs, 0, 1)  # [H, B, nx]
    fp = _run_fingerprint(w_seqs, H, cfg=cfg,
                          inputs=(template, w_nominal, bp, target))
    fp["mesh_devices"] = int(n_dev)
    fp["population"] = bool(population)

    start = 0
    state = template
    logs_so_far: list = []
    ck = latest_checkpoint(ckpt_dir)
    if ck is not None:
        _check_fingerprint(ck, fp)
        state, start = load_state(ck, template)
        saved_logs = np.load(_logs_path(ck), allow_pickle=False)
        logs_so_far = [
            ClosedLoopLog(*[jnp.asarray(saved_logs[name]) for name in ClosedLoopLog._fields])
        ]

    t = start
    while t < H:
        seg_n = min(segment_len, H - t)
        state, logs = run_segment(state, w_tm[t : t + seg_n])
        logs = ClosedLoopLog(*logs)   # time-major [seg, B, ...]
        logs_so_far.append(logs)
        t += seg_n
        merged = ClosedLoopLog(
            *[jnp.concatenate([getattr(l, f) for l in logs_so_far], axis=0)
              for f in ClosedLoopLog._fields]
        )
        logs_so_far = [merged]
        save_state(os.path.join(ckpt_dir, f"state_{t}.npz"), state, step=t, extra=fp)
        np.savez(
            os.path.join(ckpt_dir, f"logs_{t}.npz"),
            **{f: np.asarray(getattr(merged, f)) for f in ClosedLoopLog._fields},
        )

    merged = logs_so_far[0]
    return ClosedLoopLog(*[jnp.swapaxes(getattr(merged, f), 0, 1)
                           for f in ClosedLoopLog._fields])


def run_generic_closed_loop_lanes_checkpointed(
    system,
    aug,
    sys_c,
    cfg,
    *,
    raw_nom,
    raw_aux_init,
    x0,
    target,
    key=None,
    w_seqs=None,
    batch=None,
    ckpt_dir: str,
    segment_len: int = 50,
    eps: float = 1e-6,
    barrier_type: str = "inverse",
    block_b: int = 4096,
    interpret: bool = False,
    nom_compact_caps=(),
    aux_compact_caps=(),
):
    """Segmented, resumable GENERIC/COUPLED lane-engine closed loop
    (tube/lane_closed_loop.run_generic_closed_loop_lanes): the [B, ...] carry —
    every lane's state, warm starts, BOTH raw parameter sets and their momentum —
    checkpoints at segment boundaries. Returns (ClosedLoopLog [B, H, ...],
    (final raw_aux, final raw_nom)), matching the monolithic runner bit-exactly
    at segment boundaries (tests/test_checkpoint_and_systems.py)."""
    from ..tube.lane_closed_loop import (
        generic_lane_init_state,
        make_generic_lane_step,
    )
    from ..tube.lane_interface import make_lane_problem

    H = cfg.H
    if w_seqs is None:
        if key is None or batch is None:
            raise ValueError("provide w_seqs or (key, batch)")
        w_seqs = system.sample_disturbance(key, (batch, H), dtype=target.dtype)
    B = w_seqs.shape[0]
    dtype = w_seqs.dtype
    w_tm = jnp.swapaxes(w_seqs, 0, 1)  # [H, B, nx]

    pb = make_lane_problem(sys_c, barrier_type=barrier_type, eps=eps)
    step = make_generic_lane_step(
        system, aug, pb, cfg, target=target, B=B, dtype=dtype,
        block_b=block_b, interpret=interpret,
        nom_compact_caps=tuple(nom_compact_caps), aux_compact_caps=tuple(aux_compact_caps),
    )

    @jax.jit
    def run_segment(state, w_slice):
        return jax.lax.scan(step, state, w_slice)

    template = generic_lane_init_state(
        system, aug, cfg, raw_nom=raw_nom, raw_aux_init=raw_aux_init,
        x0=x0, B=B, dtype=dtype,
    )

    fp = _run_fingerprint(w_seqs, H, cfg=cfg, inputs=(template, target))
    start = 0
    state = template
    logs_so_far: list = []
    ck = latest_checkpoint(ckpt_dir)
    if ck is not None:
        _check_fingerprint(ck, fp)
        state, start = load_state(ck, template)
        saved_logs = np.load(_logs_path(ck), allow_pickle=False)
        logs_so_far = [
            ClosedLoopLog(*[jnp.asarray(saved_logs[name]) for name in ClosedLoopLog._fields])
        ]

    t = start
    while t < H:
        seg = min(segment_len, H - t)
        state, logs = run_segment(state, w_tm[t : t + seg])
        logs = ClosedLoopLog(*logs)   # time-major [seg, B, ...]
        logs_so_far.append(logs)
        t += seg
        merged = ClosedLoopLog(
            *[jnp.concatenate([getattr(l, f) for l in logs_so_far], axis=0)
              for f in ClosedLoopLog._fields]
        )
        logs_so_far = [merged]
        save_state(os.path.join(ckpt_dir, f"state_{t}.npz"), state, step=t, extra=fp)
        np.savez(
            os.path.join(ckpt_dir, f"logs_{t}.npz"),
            **{f: np.asarray(getattr(merged, f)) for f in ClosedLoopLog._fields},
        )

    merged = logs_so_far[0]
    log = ClosedLoopLog(*[jnp.swapaxes(getattr(merged, f), 0, 1)
                          for f in ClosedLoopLog._fields])
    return log, (state.raw_aux, state.raw_nom)
