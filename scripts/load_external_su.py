#!/usr/bin/env python
"""Cross-implementation validation: load a foreign (tnsu-format) Kagome
tensor set and measure it with this framework's BlockBP pipeline.

(reference: scripts/tests/su_itai_vs_roy/main.py:26-80 — loads saved tensor
sets from two independent BP-SU implementations and measures them with the
reference stack; and src/unit_cell/get_from/_simple_update.py:272-291 — the
tnsu → unit-cell bridge. The tnsu networks are saved AFTER
`absorb_all_weights()` (_simple_update.py:379), so the sqrt-λ gauge is
already folded into the tensors; the single-periodic-cell sets map straight
onto (A, B, C) with no leg permutation, _simple_update.py:272.)

The pickles reference the foreign package's classes; a stub unpickler
captures their attribute dicts without importing any reference code.

Usage:
    python scripts/load_external_su.py --all                # every size=1 PBC set
    python scripts/load_external_su.py -D 3 --average-shifts
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_FOLDER = "/root/reference/data/simple_update_results"


from kagomeperiodicbp_tpu.utils.foreign import load_tnsu  # noqa: E402


def measure_set(path: str, N: int = 2, average_shifts: bool = False,
                chi_factor: float = 1.0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from kagomeperiodicbp_tpu.algo.arbitrary import ArbitraryKagomeTN
    from kagomeperiodicbp_tpu.algo.bp import BPConfig
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.physics import hamiltonians

    data = load_tnsu(path)
    ts = [jnp.asarray(t, jnp.complex128) for t in data["tensors"]]
    if len(ts) != 3:
        raise SystemExit(
            f"{path}: {len(ts)} tensors — only single-periodic-cell (3-tensor) "
            "sets are supported (size>=2 sets use the foreign lattice's own "
            "node order; map them externally first)"
        )
    cell = UnitCell(A=ts[0], B=ts[1], C=ts[2])
    D = cell.D
    chi = int((2 * D * D + 10) * chi_factor)
    h = hamiltonians.BY_NAME["AFM"]()

    tn = ArbitraryKagomeTN.from_unit_cell(cell, N)
    meas = tn.measure(h, BPConfig(trunc_dim=2 * D * D, dtype=jnp.complex128),
                      chi=chi, average_shifts=average_shifts)
    energies = {k: float(v) for k, v in meas.energies.items()}
    return {
        "file": os.path.basename(path),
        "D": D,
        "N": N,
        "chi": chi,
        "foreign_energy": data["final_energy"],
        "mean_energy": meas.mean_energy,  # per site: Σ 6 edge classes / 3
        "edge_energies": energies,
        "edge_spread": float(np.ptp(list(energies.values()))),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path", nargs="?", help="a tnsu .dat file")
    p.add_argument("--folder", default=DEFAULT_FOLDER)
    p.add_argument("-D", type=int, default=None, help="pick the size=1 PBC set of this D")
    p.add_argument("--all", action="store_true", help="measure every size=1 PBC set")
    p.add_argument("-N", type=int, default=2, help="measurement block size")
    p.add_argument("--chi-factor", type=float, default=1.0)
    p.add_argument("--average-shifts", action="store_true")
    args = p.parse_args(argv)

    paths = []
    if args.path:
        paths = [args.path]
    elif args.all:
        paths = sorted(glob.glob(os.path.join(args.folder, "*size=1_PBC.dat")),
                       key=lambda s: int(re.search(r"D=(\d+)", s).group(1)))
    elif args.D is not None:
        paths = [os.path.join(args.folder, f"tnsu_AFH_D={args.D}_size=1_PBC.dat")]
    else:
        p.error("give a path, -D, or --all")

    for path in paths:
        out = measure_set(path, N=args.N, average_shifts=args.average_shifts,
                          chi_factor=args.chi_factor)
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
