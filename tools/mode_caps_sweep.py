#!/usr/bin/env python
"""Per-mode compact_caps sweep + batch-width scaling study (round 5).

The shipped compaction default (2,5,8) was swept on the reference-faithful
no-clip workload (BENCH_COMPACT_AB.json schedule_sweep). The clipped modes
(paper clip=1.0, generic, coupled) have a different convergence profile
(clipping keeps theta tame, so lanes converge in fewer improvement-loop trips
and the straggler tail is shorter) — their optimal caps schedule may differ.
This tool A/Bs a small candidate set per mode against the shipped default,
and separately measures headline throughput vs batch width (B=16k/32k/64k),
all through bench.py subprocesses (the exact commands users run).

Results land in BENCH_MODE_SWEEP.json; ship a per-mode default only if a
candidate beats the control by >2% reproducibly.

Reference workload being beaten: /root/reference/core/tube_mpc.py:803-996.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_battery import run_bench  # same subprocess harness  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BENCH_MODE_SWEEP.json")

MODES = {
    "paper_clip1": {"BENCH_CLIP": "1.0"},
    "generic": {"BENCH_MODE": "generic"},
    "coupled": {"BENCH_MODE": "coupled"},
}
# control first; then earlier/shorter schedules suited to fast-converging lanes
CANDIDATES = ("2,5,8", "1,3,5", "2,4", "1,4,8", "2,4,6")
BATCHES = (8192, 16384, 32768, 65536)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-batch", action="store_true")
    ap.add_argument("--skip-modes", action="store_true")
    ap.add_argument("--runoff", action="store_true",
                    help="re-measure each mode's top two sweep candidates at 7 "
                         "repeats (reads the existing BENCH_MODE_SWEEP.json)")
    args = ap.parse_args()

    if args.runoff:
        with open(OUT, "r", encoding="utf-8") as f:
            report = json.load(f)
        for mode, env in MODES.items():
            rows = report["modes"][mode]["candidates_solves_per_sec"]
            top2 = sorted(rows, key=rows.get, reverse=True)[:2]
            runoff = {}
            for caps in top2:
                print(f"[runoff] {mode} caps={caps} (7 repeats) ...", flush=True)
                out = run_bench({**env, "BENCH_COMPACT": caps}, 7)
                print(f"[runoff] {mode} caps={caps}: {json.dumps(out)}", flush=True)
                if out.get("error"):
                    report["modes"][mode]["runoff_error"] = out["error"]
                    break
                runoff[caps] = out["value"]
            if runoff:
                winner = max(runoff, key=runoff.get)
                control = rows[CANDIDATES[0]]
                report["modes"][mode]["runoff_7_repeats"] = runoff
                report["modes"][mode]["winner"] = winner
                report["modes"][mode]["winner_vs_control"] = round(
                    runoff[winner] / control, 4)
            with open(OUT, "w", encoding="utf-8") as f:
                json.dump(report, f, indent=2)
        print(json.dumps({m: report["modes"][m].get("winner")
                          for m in MODES}, indent=2))
        return

    if os.path.exists(OUT):  # partial re-runs extend, not clobber
        with open(OUT, "r", encoding="utf-8") as f:
            report = json.load(f)
    else:
        report = {"what": __doc__.strip().splitlines()[0], "modes": {}, "batch": {}}

    def checkpoint() -> None:
        with open(OUT, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2)

    if not args.skip_modes:
        for mode, env in MODES.items():
            if "candidates_solves_per_sec" in (report["modes"].get(mode) or {}):
                continue
            rows = {}
            for caps in CANDIDATES:
                print(f"[sweep] {mode} caps={caps} ...", flush=True)
                out = run_bench({**env, "BENCH_COMPACT": caps}, args.repeats)
                print(f"[sweep] {mode} caps={caps}: {json.dumps(out)}", flush=True)
                if out.get("error"):
                    report["modes"][mode] = {"error": out["error"], "partial": rows}
                    checkpoint()
                    return
                rows[caps] = out["value"]
            control = rows[CANDIDATES[0]]
            best = max(rows, key=rows.get)
            report["modes"][mode] = {
                "candidates_solves_per_sec": rows,
                "control_caps": CANDIDATES[0],
                "best_caps": best,
                "best_vs_control": round(rows[best] / control, 4),
            }
            checkpoint()

    if not args.skip_batch:
        rows = (report.get("batch") or {}).get("rows", {})
        for b in BATCHES:
            if str(b) in rows:
                continue
            print(f"[sweep] no-clip B={b} ...", flush=True)
            out = run_bench({"BENCH_B": str(b)}, args.repeats)
            print(f"[sweep] no-clip B={b}: {json.dumps(out)}", flush=True)
            if out.get("error"):
                report["batch"] = {"error": out["error"], "partial": rows}
                checkpoint()
                return
            rows[str(b)] = {"solves_per_sec": out["value"],
                            "finite_lane_frac": out.get("finite_lane_frac")}
        report["batch"] = {"rows": rows,
                           "note": "headline stays at B=16384 for comparability; "
                                   "this measures whether per-chip throughput is "
                                   "batch-starved at the headline point"}
        checkpoint()

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
