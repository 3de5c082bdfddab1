#!/usr/bin/env python
"""Diagnostic: compare unit cells — energy, per-edge energies, per-site
spin polarization (magnitude + mutual angles), entanglement negativity.

Used to understand what distinguishes optimization basins (e.g. why a q=0
120°-ordered fixed point sits above the reference's best-store basin).

    python tools/compare_cells.py cellA.pkl [cellB.pkl ...] [--n 3] [--chi-factor 2]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(path: str, N: int, chi_factor: float):
    import numpy as np

    from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
    from kagomeperiodicbp_tpu.algo.measurements import (
        measure_energies_and_observables)
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.physics.hamiltonians import heisenberg_afm

    cell = UnitCell.load(path)
    D = cell.D
    chi = int((2 * D * D + 10) * chi_factor)
    cfg = BPConfig(trunc_dim=int(2 * D * D * chi_factor), dtype=cell.A.dtype)
    msgs, stats = robust_belief_propagation(cell, None, cfg, N)
    meas = measure_energies_and_observables(cell, msgs, N, chi, cfg.trunc_dim,
                                            heisenberg_afm())
    print(f"\n=== {os.path.basename(path)}  (D={D}, measured N={N}, chi={chi}) ===")
    print(f"mean energy/site: {meas.mean_energy:+.10f}   bp_err={stats.final_error:.2e}")
    print("per-edge:", {k: round(v, 6) for k, v in sorted(meas.energies.items())})
    vecs = {}
    for f in "ABC":
        v = np.array([meas.expectations[f][k] for k in "xyz"])
        vecs[f] = v
        print(f"  <S>_{f} = [{v[0]:+.4f} {v[1]:+.4f} {v[2]:+.4f}]  |S|={np.linalg.norm(v)/2:.4f}")
    for a, b in ("AB", "BC", "AC"):
        na, nb = np.linalg.norm(vecs[a]), np.linalg.norm(vecs[b])
        if na > 1e-6 and nb > 1e-6:
            cos = float(np.dot(vecs[a], vecs[b]) / (na * nb))
            print(f"  angle({a},{b}) = {np.degrees(np.arccos(np.clip(cos, -1, 1))):.1f} deg")
    # scalar chirality of the polarization triad
    import numpy.linalg as la
    tri = np.dot(vecs["A"], np.cross(vecs["B"], vecs["C"]))
    print(f"  chirality A.(BxC) = {tri:+.5f}")
    print("negativity:", {k: round(v, 5) for k, v in sorted(meas.entanglement.items())})
    return meas


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cells", nargs="+")
    p.add_argument("--n", type=int, default=3)
    p.add_argument("--chi-factor", type=float, default=2.0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from kagomeperiodicbp_tpu.utils.jaxtools import enable_compilation_cache

    enable_compilation_cache()
    for path in args.cells:
        analyze(path, args.n, args.chi_factor)


if __name__ == "__main__":
    main()
