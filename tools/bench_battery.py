#!/usr/bin/env python
"""Run the full headline-bench battery and fold measured numbers into docs.

One command to re-establish every headline number the moment the TPU is
reachable (round-3 post-mortem: a tunnel outage at the driver's one-shot
capture left the round without a number of record):

    python tools/bench_battery.py [--skip-compaction] [--repeats 3]

Per mode it runs ``bench.py`` in a subprocess with the documented env knobs
(the same commands users run), parses the single JSON line, and — if every
mode succeeded — rewrites ``docs/numbers.json``'s headline entries with the
measured values and a provenance stamp, then regenerates the doc regions via
``tools/render_numbers.py``. A backend failure (bench.py's probe emits
``error``) aborts before touching any doc.

The optional compaction study then runs ``benchmarks/iter_probe.py`` at the
headline batch to capture the real per-step convergence profile and its
recommended compact_caps schedule, and A/Bs the recommendation via
``BENCH_COMPACT`` (the straggler-compaction lever,
ops/pallas/lane_solver.lane_ilqr_solve). Results land in BENCH_COMPACT_AB.json
for docs/PERFORMANCE.md to cite either a win (ship default caps) or a
measured negative result.

Reference workload being beaten: 2 iLQR solves per closed-loop step,
/root/reference/core/tube_mpc.py:803-996, 0.956 solves/s on this host's CPU.
"""
from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = {
    # numbers.json key -> env overrides for bench.py
    "paper_noclip": {},
    "paper_clip1": {"BENCH_CLIP": "1.0"},
    "generic": {"BENCH_MODE": "generic"},
    "coupled": {"BENCH_MODE": "coupled"},
}


def run_bench(env_over: dict, repeats: int, timeout_s: float = 3600) -> dict:
    env = dict(os.environ)
    env.update(env_over)
    env["BENCH_REPEATS"] = str(repeats)
    r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       capture_output=True, text=True, timeout=timeout_s,
                       cwd=ROOT, env=env)
    line = (r.stdout.strip().splitlines() or ["{}"])[-1]
    try:
        out = json.loads(line)
    except json.JSONDecodeError:
        out = {"error": f"unparseable bench output: {line[:200]!r} "
                        f"(stderr tail: {(r.stderr.strip().splitlines() or [''])[-1]!r})"}
    return out


FAMILIES = ("double_integrator", "cartpole", "quadrotor2d")


def run_families(repeats: int, stamp: str) -> None:
    """Per-family lane-engine throughput (BENCH_SYSTEM=<fam> bench.py): the
    'generic lane engine' claim with numbers — the reference has ONE system
    (tube_mpc.py:42-43 raises for anything but dubins); we bench all four
    families' shipped configs at N=50/H=300 on the same fused kernels."""
    rows = {}
    for fam in FAMILIES:
        print(f"[battery] family {fam}: running bench.py ...", flush=True)
        out = run_bench({"BENCH_SYSTEM": fam}, repeats)
        print(f"[battery] family {fam}: {json.dumps(out)}", flush=True)
        if out.get("error") or not out.get("value"):
            print(f"[battery] family {fam} FAILED; families table not updated",
                  flush=True)
            return
        rows[fam] = {
            "solves_per_sec": int(round(out["value"])),
            "finite_lane_frac": out.get("finite_lane_frac"),
            "cmd": f"BENCH_SYSTEM={fam} python bench.py",
            "captured": stamp,
        }
    nums_path = os.path.join(ROOT, "docs", "numbers.json")
    with open(nums_path, "r", encoding="utf-8") as f:
        nums = json.load(f)
    nums["families"] = rows
    with open(nums_path, "w", encoding="utf-8") as f:
        json.dump(nums, f, indent=2)
    subprocess.run([sys.executable, os.path.join(ROOT, "tools", "render_numbers.py")],
                   check=True, cwd=ROOT)
    print("[battery] families table updated + docs regenerated", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-compaction", action="store_true")
    ap.add_argument("--skip-families", action="store_true")
    ap.add_argument("--skip-hw-shard-pin", action="store_true")
    ap.add_argument("--stamp", type=str, default=None,
                    help="provenance string; default: builder battery <UTC now>")
    args = ap.parse_args()
    stamp = args.stamp or (
        "builder battery "
        + datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%MZ")
        + " at HEAD (all modes one session; median of "
        + str(args.repeats) + " steady-state repeats)")

    results: dict = {}
    for key, env_over in MODES.items():
        print(f"[battery] {key}: running bench.py {env_over or '(defaults)'} ...",
              flush=True)
        out = run_bench(env_over, args.repeats)
        print(f"[battery] {key}: {json.dumps(out)}", flush=True)
        if out.get("error") or out.get("value") in (None, 0):
            print(f"[battery] ABORT: {key} failed ({out.get('error', 'no value')}); "
                  "docs untouched", flush=True)
            sys.exit(1)
        results[key] = out

    nums_path = os.path.join(ROOT, "docs", "numbers.json")
    with open(nums_path, "r", encoding="utf-8") as f:
        nums = json.load(f)
    for key, out in results.items():
        entry = nums["headline"][key]
        entry["solves_per_sec"] = int(round(out["value"]))
        entry["finite_lane_frac"] = out.get("finite_lane_frac")
        entry["captured"] = stamp
        # the driver's own end-of-round capture is the only thing that may set
        # driver_verified; a builder battery records measured-but-builder-run
        entry["driver_verified"] = False
    with open(nums_path, "w", encoding="utf-8") as f:
        json.dump(nums, f, indent=2)
    subprocess.run([sys.executable, os.path.join(ROOT, "tools", "render_numbers.py")],
                   check=True, cwd=ROOT)
    print("[battery] docs/numbers.json updated + docs regenerated", flush=True)

    if not args.skip_families:
        run_families(args.repeats, stamp)

    if not args.skip_hw_shard_pin:
        print("[battery] hw_shard_pin (shard_map+Mosaic on the real chip) ...",
              flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "hw_shard_pin.py")],
            capture_output=True, text=True, timeout=3600, cwd=ROOT)
        print(r.stdout[-1500:], flush=True)
        if r.returncode != 0:
            print(f"[battery] hw_shard_pin FAILED (rc={r.returncode}): "
                  f"{(r.stderr.strip().splitlines() or [''])[-1]}", flush=True)

    if args.skip_compaction:
        return

    # ---- compaction study: measure the real convergence profile, A/B the caps ----
    print("[battery] iter_probe at headline batch ...", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "iter_probe.py"),
         "--batch", "16384"],
        capture_output=True, text=True, timeout=7200, cwd=ROOT)
    print(r.stdout[-2500:], flush=True)
    probe = None
    start = r.stdout.find("{")
    if start >= 0:
        try:
            probe = json.loads(r.stdout[start:])
        except json.JSONDecodeError:
            probe = None

    def best_caps(sched: dict) -> tuple:
        """Pick the candidate schedule with the best simulated speedup (>3%)."""
        best_name, best_x = None, 1.03
        for name, v in sched.items():
            if name == "uncompacted_trips":
                continue
            if v["speedup_x"] > best_x:
                best_name, best_x = name, v["speedup_x"]
        if best_name is None:
            return ()
        return tuple(int(c) for c in best_name.strip("(),").split(",") if c)

    ab = {"probe_compact_schedule_sim": (probe or {}).get("compact_schedule_sim"),
          "baseline": results["paper_noclip"]}
    sim = (probe or {}).get("compact_schedule_sim")
    if sim:
        aux_caps = best_caps(sim["aux"])
        nom_caps = best_caps(sim["nominal"])
        caps_str = ",".join(map(str, aux_caps))
        if nom_caps:
            caps_str += ";" + ",".join(map(str, nom_caps))
        if not aux_caps and not nom_caps:
            ab["note"] = "simulator predicts <3% win for every candidate schedule"
        else:
            print(f"[battery] A/B with BENCH_COMPACT={caps_str}", flush=True)
            ab["compact_caps"] = caps_str
            ab["compacted"] = run_bench({"BENCH_COMPACT": caps_str}, args.repeats)
            base_v = results["paper_noclip"]["value"]
            comp_v = ab["compacted"].get("value") or 0
            ab["speedup"] = round(comp_v / base_v, 4) if base_v else None
    else:
        ab["note"] = "probe emitted no schedule simulation; see stdout above"
    with open(os.path.join(ROOT, "BENCH_COMPACT_AB.json"), "w", encoding="utf-8") as f:
        json.dump(ab, f, indent=2)
    # flip docs/PERFORMANCE.md's numbers:compaction block from "pending" to the
    # measured result (render_compaction reads BENCH_COMPACT_AB.json)
    subprocess.run([sys.executable, os.path.join(ROOT, "tools", "render_numbers.py")],
                   check=True, cwd=ROOT)
    print(f"[battery] BENCH_COMPACT_AB.json written + compaction block rendered "
          f"(speedup: {ab.get('speedup')})", flush=True)


if __name__ == "__main__":
    main()
