#!/usr/bin/env python
"""Round-5 physics campaign, v3: best-store / bond-anneal warm starts.

v2's premise — SU(q0) bootstraps — died on data: our 2-site kagome SU with
a q0 seed measures only ~−0.291 at D=3 (logs/campaign_r5b.log step 0),
nowhere near the published tnsu SU quality (−0.41786) the reference warm
starts from (/root/reference/scripts/run_ite.py:78-107).  The states we DO
have at reference-competitive quality are the best store (D=2 −0.40239,
D=3 −0.40690, D=4 −0.40723) — so v3 converts round-4's verdict plan
directly: deep-polish the committed records and bond-anneal upward.

  1. D=3 deep polish from best   (target ≤ −0.413; ref measured −0.4139)
  2. D=4 polish from best        (target past −0.418; ref −0.42024)
  3. D=5 first record: pad:4 anneal, short ladder, measure + pin
  4. D=2 seed×protocol sweep (basin attack, VERDICT r4 next #2) if time

Stages are fail-isolated; records land in the best store as they happen
(--use-lowest-energy-state + save_best_store in run_ite).

Usage: KPBP_CAMPAIGN_HOURS=4.2 setsid nohup nice -n 10 python -u \
    scripts/campaign_r5c.py > logs/campaign_r5c.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

with open("/tmp/campaign_r5c.pid", "w") as fh:
    fh.write(str(os.getpid()))

T0 = time.time()
BUDGET_H = float(os.environ.get("KPBP_CAMPAIGN_HOURS", "4.2"))
COMMON = ["-N", "2", "--platform", "cpu", "--optimize-dtype", "complex64",
          "--use-lowest-energy-state", "--measure-every", "5"]


def stamp(msg: str) -> None:
    print(f"[campaign {time.strftime('%H:%M:%S')} +{(time.time()-T0)/60:.0f}m] {msg}",
          flush=True)


def hours_left() -> float:
    return BUDGET_H - (time.time() - T0) / 3600.0


def run_point(tag: str, argv: list[str]) -> float | None:
    import run_ite

    t0 = time.time()
    stamp(f"{tag}: start ({hours_left():.1f}h left)")
    try:
        e = float(run_ite.main(argv + COMMON))
        stamp(f"{tag}: energy={e:.8f} in {time.time()-t0:.0f}s")
        return e
    except SystemExit as exc:
        stamp(f"{tag}: SystemExit {exc} after {time.time()-t0:.0f}s")
    except Exception:
        stamp(f"{tag}: FAILED after {time.time()-t0:.0f}s — "
              + traceback.format_exc(limit=3).replace("\n", " | "))
    return None


def main() -> None:
    # ---- 1. D=3 deep polish from the committed record ----------------------
    run_point("D3_deep", [
        "-D", "3", "--cell", "best", "--seed", "2",
        "--dt-start", "3e-4", "--dt-stop", "3e-5", "--steps-per-dt", "14",
        "--mode-reps", "5", "--out", os.path.join(HERE, "data/runs/D3_deep_r5")])

    # ---- 2. D=4 polish from the committed record ----------------------------
    if hours_left() > 1.8:
        run_point("D4_polish", [
            "-D", "4", "--cell", "best", "--seed", "2",
            "--dt-start", "3e-4", "--dt-stop", "1e-4",
            "--steps-per-dt", "10" if hours_left() > 2.6 else "6",
            "--mode-reps", "5", "--out", os.path.join(HERE, "data/runs/D4_polish_r5")])

    # ---- 3. D=5 first record: bond-anneal from D=4 --------------------------
    if hours_left() > 0.6:
        run_point("D5_pad", [
            "-D", "5", "--cell", "pad:4", "--seed", "0", "--init-noise", "0.01",
            "--dt-start", "1e-3", "--dt-stop", "3e-4",
            "--steps-per-dt", "6" if hours_left() > 1.2 else "3",
            "--mode-reps", "3", "--out", os.path.join(HERE, "data/runs/D5_pad_r5")])

    # ---- 4. D=2 basin sweep (seeds × protocols), then tail the winner -------
    if hours_left() > 0.8:
        run_point("D2_q0_anneal", [
            "-D", "2", "--cell", "q0", "--seed", "3", "--init-noise", "0.1",
            "--hamiltonian", "AFM-T", "--field-start", "0.2",
            "--dt-start", "3e-3", "--dt-stop", "1e-4", "--steps-per-dt", "12",
            "--mode-reps", "5", "--out", os.path.join(HERE, "data/runs/D2_q0_r5")])
    if hours_left() > 0.4:
        run_point("D2_tail", [
            "-D", "2", "--cell", "best", "--seed", "4",
            "--dt-start", "1e-4", "--dt-stop", "1e-5", "--steps-per-dt", "12",
            "--mode-reps", "5", "--out", os.path.join(HERE, "data/runs/D2_tail_r5")])

    stamp("campaign complete")
    try:
        from kagomeperiodicbp_tpu.utils.best_store import load_best

        summary = {f"D={d}": (load_best(d) or (None, None))[1] for d in (2, 3, 4, 5)}
        stamp("best store: " + json.dumps(summary))
    finally:
        os.remove("/tmp/campaign_r5c.pid")


if __name__ == "__main__":
    main()
