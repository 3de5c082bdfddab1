#!/usr/bin/env python
"""Round-5 physics campaign: basin sweep -> deep ladders -> first D=5 record.

VERDICT r4 next-steps #1 + #2 in one driver:

  stage 1  D=3 basin sweep: 7 start-protocol points (q0 / random / AFM-T
           annealing / pad:2 control), short dt=1e-2..1e-4 ladder, pure
           exploration (no lowest-energy revert).  The reference bought
           basin selection with condor campaigns over seed x noise x method
           (/root/reference/scripts/condor/main_sender.py:42-52); this is
           the one-core equivalent.  Results -> data/sweeps/basin_r5.csv.
  stage 2  deep ladder D=3 from the sweep winner (dt 1e-3..1e-7, reference
           production conventions: 5 mode reps, lowest-energy revert).
  stage 3  D=4 from pad:3 (bond-dimension annealing), medium ladder.
  stage 4  D=5: measure_padded seeds the record book from pad:4, then a
           short ITE polish.

Runs ALL stages in ONE process so every stage after the first reuses the
in-memory jit cache (the persistent cache is unusable on this machine --
see utils/jaxtools.enable_compilation_cache).  Each stage is fail-isolated;
records land in the best store as they happen, so a crash loses nothing.

Usage:  nice -n 10 python -u scripts/campaign_r5.py > logs/campaign_r5.log 2>&1 &
"""
from __future__ import annotations

import csv
import glob
import json
import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

with open("/tmp/campaign_r5.pid", "w") as fh:
    fh.write(str(os.getpid()))

COMMON = ["-N", "2", "--platform", "cpu", "--optimize-dtype", "complex64"]


def stamp(msg: str) -> None:
    print(f"[campaign {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_point(tag: str, argv: list[str]) -> dict:
    import run_ite

    t0 = time.time()
    row = {"tag": tag, "argv": " ".join(argv), "energy": None,
           "seconds": None, "error": ""}
    try:
        row["energy"] = float(run_ite.main(argv + COMMON))
    except SystemExit as e:          # argparse/SystemExit from cell sources
        row["error"] = f"SystemExit: {e}"
    except Exception:
        row["error"] = traceback.format_exc(limit=3).replace("\n", " | ")
    row["seconds"] = round(time.time() - t0, 1)
    stamp(f"{tag}: energy={row['energy']} in {row['seconds']}s {row['error'][:200]}")
    return row


def main() -> None:
    os.makedirs(os.path.join(HERE, "data", "sweeps"), exist_ok=True)

    # ---- stage 1: D=3 basin sweep -------------------------------------
    sweep = [
        ("q0_s0",      ["-D", "3", "--cell", "q0",  "--init-noise", "0.05", "--seed", "0"]),
        ("q0_noisy",   ["-D", "3", "--cell", "q0",  "--init-noise", "0.3",  "--seed", "1"]),
        ("rand_s2",    ["-D", "3", "--cell", "random", "--seed", "2"]),
        ("rand_s3",    ["-D", "3", "--cell", "random", "--seed", "3"]),
        ("afmt_q0",    ["-D", "3", "--cell", "q0", "--init-noise", "0.05", "--seed", "4",
                        "--hamiltonian", "AFM-T", "--field-start", "0.05"]),
        ("afmt_rand",  ["-D", "3", "--cell", "random", "--seed", "5",
                        "--hamiltonian", "AFM-T", "--field-start", "0.1"]),
        ("pad2_ctrl",  ["-D", "3", "--cell", "pad:2", "--seed", "6"]),
    ]
    short = ["--dt-start", "1e-2", "--dt-stop", "1e-4", "--steps-per-dt", "10",
             "--mode-reps", "3", "--measure-every", "5"]
    rows = []
    for tag, argv in sweep:
        out = os.path.join(HERE, "data", "runs", "sweep_r5", tag)
        rows.append(run_point(tag, argv + short + ["--out", out]))
        with open(os.path.join(HERE, "data", "sweeps", "basin_r5.csv"), "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=["tag", "energy", "seconds", "error", "argv"])
            w.writeheader()
            w.writerows(rows)

    done = [r for r in rows if r["energy"] is not None]
    if done:
        winner = min(done, key=lambda r: r["energy"])
        stamp(f"sweep winner: {winner['tag']} at {winner['energy']}")
        cells = glob.glob(os.path.join(HERE, "data", "runs", "sweep_r5",
                                       winner["tag"], "D=3 energy=*.pkl"))
        win_cell = min(cells, key=lambda p: float(p.split("energy=")[1][:-4])) if cells else "best"
    else:
        stamp("sweep produced nothing; deep ladder falls back to best store")
        win_cell = "best"

    # ---- stage 2: deep D=3 ladder --------------------------------------
    run_point("D3_deep", [
        "-D", "3", "--cell", win_cell, "--seed", "7",
        "--dt-start", "1e-3", "--dt-stop", "1e-7", "--steps-per-dt", "80",
        "--mode-reps", "5", "--use-lowest-energy-state", "--measure-every", "10",
        "--out", os.path.join(HERE, "data", "runs", "D3_deep_r5")])

    # ---- stage 3: D=4 from pad:3 ---------------------------------------
    run_point("D4", [
        "-D", "4", "--cell", "pad:3", "--seed", "0",
        "--dt-start", "1e-3", "--dt-stop", "1e-6", "--steps-per-dt", "40",
        "--mode-reps", "5", "--use-lowest-energy-state", "--measure-every", "10",
        "--out", os.path.join(HERE, "data", "runs", "D4_r5")])

    # ---- stage 4: first D=5 record -------------------------------------
    try:
        import measure_padded

        t0 = time.time()
        measure_padded.main(["-D", "5"])
        stamp(f"measure_padded D=5 done in {time.time() - t0:.0f}s")
    except Exception:
        stamp("measure_padded D=5 failed: " + traceback.format_exc(limit=3).replace("\n", " | "))
    run_point("D5_polish", [
        "-D", "5", "--cell", "pad:4", "--seed", "0",
        "--dt-start", "1e-3", "--dt-stop", "1e-4", "--steps-per-dt", "20",
        "--mode-reps", "3", "--use-lowest-energy-state", "--measure-every", "5",
        "--out", os.path.join(HERE, "data", "runs", "D5_r5")])

    stamp("campaign complete")
    try:
        from kagomeperiodicbp_tpu.utils.best_store import load_best

        summary = {f"D={d}": (load_best(d) or (None, None))[1] for d in (2, 3, 4, 5)}
        stamp("best store: " + json.dumps(summary))
    finally:
        os.remove("/tmp/campaign_r5.pid")


if __name__ == "__main__":
    main()
