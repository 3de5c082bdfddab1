#!/usr/bin/env python
"""Round-5 physics campaign, v4: tnsu warm starts — the reference's own
protocol (reference run_ite.py:78-107 loads the published tnsu SU state and
polishes it with ITE; our v3 campaign polished the home-grown −0.407 basin
because our 2-site SU can't reach tnsu quality, logs/campaign_r5b.log).

`--cell tnsu` (scripts/run_ite.py via utils/foreign.py) loads the same
published SU states the reference starts from, so this campaign is the
apples-to-apples parity run: same warm start, our ITE.

  1. D=3 tnsu polish   (target ≤ −0.413; ref committed −0.41420)
  2. D=4 tnsu polish   (target past −0.418; ref −0.42024)
  3. D=5 tnsu polish   (first D=5 record; ref −0.42894)
  4. D=2 tnsu polish   (ref −0.40464; our basin best −0.40239)

Records land in the best store as they happen (--use-lowest-energy-state).

Usage: KPBP_CAMPAIGN_HOURS=3.5 setsid nohup nice -n 10 python -u \
    scripts/campaign_r5d.py > logs/campaign_r5d.log 2>&1 &
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

with open("/tmp/campaign_r5d.pid", "w") as fh:
    fh.write(str(os.getpid()))

T0 = time.time()
BUDGET_H = float(os.environ.get("KPBP_CAMPAIGN_HOURS", "3.5"))
COMMON = ["-N", "2", "--platform", "cpu", "--optimize-dtype", "complex64",
          "--use-lowest-energy-state", "--measure-every", "5",
          "--cell", "tnsu", "--init-noise", "0"]


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
    # ---- 1. D=3: the headline parity number ---------------------------------
    run_point("D3_tnsu", [
        "-D", "3", "--seed", "2",
        "--dt-start", "1e-3", "--dt-stop", "3e-5", "--steps-per-dt", "12",
        "--mode-reps", "5", "--out", os.path.join(HERE, "data/runs/D3_tnsu_r5")])

    # ---- 2. D=4 --------------------------------------------------------------
    if hours_left() > 1.6:
        run_point("D4_tnsu", [
            "-D", "4", "--seed", "2",
            "--dt-start", "1e-3", "--dt-stop", "1e-4",
            "--steps-per-dt", "8" if hours_left() > 2.2 else "5",
            "--mode-reps", "4", "--out", os.path.join(HERE, "data/runs/D4_tnsu_r5")])

    # ---- 3. D=5: first record ------------------------------------------------
    if hours_left() > 0.5:
        run_point("D5_tnsu", [
            "-D", "5", "--seed", "2",
            "--dt-start", "1e-3", "--dt-stop", "3e-4",
            "--steps-per-dt", "5" if hours_left() > 1.0 else "3",
            "--mode-reps", "3", "--out", os.path.join(HERE, "data/runs/D5_tnsu_r5")])

    # ---- 4. D=2 parity tail ---------------------------------------------------
    if hours_left() > 0.5:
        run_point("D2_tnsu", [
            "-D", "2", "--seed", "2",
            "--dt-start", "1e-3", "--dt-stop", "1e-5", "--steps-per-dt", "12",
            "--mode-reps", "5", "--out", os.path.join(HERE, "data/runs/D2_tnsu_r5")])

    stamp("campaign complete")
    try:
        from kagomeperiodicbp_tpu.utils.best_store import load_best

        summary = {f"D={d}": (load_best(d) or (None, None))[1] for d in (2, 3, 4, 5)}
        stamp("best store: " + json.dumps(summary))
    finally:
        os.remove("/tmp/campaign_r5d.pid")


if __name__ == "__main__":
    main()
