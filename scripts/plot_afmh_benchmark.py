#!/usr/bin/env python
"""Energy-vs-D comparison against published Kagome AFM Heisenberg values.

(reference: /root/reference/scripts/plot/afmh_benchmarking.py:26-42 — the
published simple-update (SU) and variational-update (VU) numbers from the
variPEPS literature, plus this repo's best stored results.)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PUBLISHED_SU = {2: -0.38620, 3: -0.41786, 4: -0.42323, 5: -0.42866,
                6: -0.43188, 7: -0.43313, 8: -0.43391}
PUBLISHED_VU = {2: -0.40454, 3: -0.42688, 4: -0.43038, 5: -0.43286,
                6: -0.43451, 7: -0.43527, 8: -0.43552}
REFERENCE_BLOCKBP = {2: -0.4046412208223448, 3: -0.41420215914597786,
                     4: -0.4202411110635614, 5: -0.42894009602652244}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--best-folder", default="data/unit_cells/best")
    p.add_argument("--plot", default=None, help="optional output PNG path")
    args = p.parse_args(argv)

    from kagomeperiodicbp_tpu.utils.best_store import load_best

    rows = []
    for D in sorted(PUBLISHED_SU):
        ours = load_best(D, args.best_folder)
        rows.append((D, PUBLISHED_SU[D], PUBLISHED_VU[D],
                     REFERENCE_BLOCKBP.get(D), ours[1] if ours else None))

    print(f"{'D':>2} {'published SU':>14} {'published VU':>14} "
          f"{'ref BlockBP':>14} {'this repo':>14}")
    for D, su, vu, ref, mine in rows:
        print(f"{D:>2} {su:>14.5f} {vu:>14.5f} "
              f"{ref if ref is not None else float('nan'):>14.10f} "
              + (f"{mine:>14.10f}" if mine is not None else f"{'—':>14}"))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 5))
        Ds = [r[0] for r in rows]
        ax.plot(Ds, [r[1] for r in rows], "o-", label="published SU")
        ax.plot(Ds, [r[2] for r in rows], "s-", label="published VU")
        ref_ds = [r[0] for r in rows if r[3] is not None]
        ax.plot(ref_ds, [r[3] for r in rows if r[3] is not None], "^-",
                label="reference BlockBP")
        mine_ds = [r[0] for r in rows if r[4] is not None]
        if mine_ds:
            ax.plot(mine_ds, [r[4] for r in rows if r[4] is not None], "*-",
                    ms=12, label="this repo")
        ax.set_xlabel("D")
        ax.set_ylabel("energy / site")
        ax.legend()
        ax.grid(alpha=0.3)
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"plot saved to {args.plot}")
    return rows


if __name__ == "__main__":
    main()
