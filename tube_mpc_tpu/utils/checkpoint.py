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


def _run_fingerprint(w, H: int) -> dict:
    """Identity of a checkpointed run: shapes + a content hash of the disturbance
    stream. Resuming with different inputs would silently concatenate inconsistent
    logs; save_state stores this via its extra= hook and resume verifies it."""
    import hashlib

    arr = np.asarray(w)
    return {
        "H": int(H),
        "w_shape": list(arr.shape),
        "w_sha1": hashlib.sha1(arr.tobytes()).hexdigest()[:16],
    }


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

    fp = _run_fingerprint(w_seq, H)
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

    fp = _run_fingerprint(w_seqs, H)
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

    fp = _run_fingerprint(w_seqs, H)
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
