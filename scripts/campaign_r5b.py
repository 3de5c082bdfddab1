#!/usr/bin/env python
"""Round-5 physics campaign, v2: SU(q0) warm starts + ITE polish ladders.

Replaces campaign_r5.py after its basin sweep measured the real cost of a
D=3 ITE segment on this one-core box (~2-3.5 min with contention, not the
~15 s the r4c plan assumed): a 7-point ITE-from-product sweep would need
~12 h before any deep ladder.  The reference never paid that cost either —
its production runs warm-start from tnsu simple-update states
(/root/reference/scripts/run_ite.py:78-107 unit_cell_from='tnsu') and spend
ITE only on full-update polish.  Our SU with the q0 120° seed avoids the
dimerized trap (run_ite.py:150-173, measured −0.326 random vs ordered q0)
and costs ~minutes at any D, so this campaign does:

  1. D=3: SU(q0) bootstrap → polish ladder (dt 1e-3..1e-4)
  2. D=3: deep tail from the best (dt 1e-4..1e-5)
  3. D=4: SU(q0) bootstrap → polish (published SU D=4 is −0.42323;
     bond-annealed pad:3 is the fallback if SU measures badly)
  4. D=5: SU(q0) bootstrap, measured + pinned (first D=5 record), short polish
  5. D=2: SU(q0) + polish (chasing the reference's −0.40464)

Every stage is fail-isolated and records land in the best store as they
happen; a time gate skips later polish stages when the round is running out.

Usage:  nice -n 10 python -u scripts/campaign_r5b.py > logs/campaign_r5b.log 2>&1 &
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

with open("/tmp/campaign_r5b.pid", "w") as fh:
    fh.write(str(os.getpid()))

T0 = time.time()
BUDGET_H = float(os.environ.get("KPBP_CAMPAIGN_HOURS", "6.5"))
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
    # ---- 1. D=3 SU(q0) bootstrap + polish ----------------------------------
    run_point("D3_su_polish", [
        "-D", "3", "--cell", "su:q0", "--seed", "0", "--init-noise", "0.05",
        "--dt-start", "1e-3", "--dt-stop", "1e-4", "--steps-per-dt", "15",
        "--mode-reps", "5", "--out", os.path.join(HERE, "data/runs/D3_su_r5")])

    # ---- 2. D=3 deep tail from best ----------------------------------------
    if hours_left() > 4.0:
        run_point("D3_deep_tail", [
            "-D", "3", "--cell", "best", "--seed", "1",
            "--dt-start", "1e-4", "--dt-stop", "1e-5", "--steps-per-dt", "20",
            "--mode-reps", "5", "--out", os.path.join(HERE, "data/runs/D3_deep_r5")])

    # ---- 3. D=4 SU(q0) bootstrap + polish ----------------------------------
    run_point("D4_su_polish", [
        "-D", "4", "--cell", "su:q0", "--seed", "0", "--init-noise", "0.05",
        "--dt-start", "1e-3", "--dt-stop", "1e-4",
        "--steps-per-dt", "12" if hours_left() > 3.0 else "6",
        "--mode-reps", "5", "--out", os.path.join(HERE, "data/runs/D4_su_r5")])

    # ---- 4. D=5: SU(q0) record seed + short polish --------------------------
    run_point("D5_su", [
        "-D", "5", "--cell", "su:q0", "--seed", "0", "--init-noise", "0.05",
        "--dt-start", "1e-3", "--dt-stop", "1e-3",
        "--steps-per-dt", "6" if hours_left() > 1.5 else "2",
        "--mode-reps", "3", "--out", os.path.join(HERE, "data/runs/D5_su_r5")])

    # ---- 5. D=2 SU(q0) + polish (cheap; reference parity chase) ------------
    if hours_left() > 0.7:
        run_point("D2_su_polish", [
            "-D", "2", "--cell", "su:q0", "--seed", "0", "--init-noise", "0.05",
            "--dt-start", "1e-3", "--dt-stop", "1e-5", "--steps-per-dt", "20",
            "--mode-reps", "5", "--out", os.path.join(HERE, "data/runs/D2_su_r5")])

    stamp("campaign complete")
    try:
        from kagomeperiodicbp_tpu.utils.best_store import load_best

        summary = {f"D={d}": (load_best(d) or (None, None))[1] for d in (2, 3, 4, 5)}
        stamp("best store: " + json.dumps(summary))
    finally:
        os.remove("/tmp/campaign_r5b.pid")


if __name__ == "__main__":
    main()
