#!/usr/bin/env python
"""Produce the golden file for tests/test_measurement_pin.py.

`production_measurement` IS the production convention: the same procedure
`full_ite` uses for every recorded energy (algo/ite.py measurement block) —
zero-rotation cell, fresh robust BP with `BPConfig(2D²).for_measurements(2)`
on an (N+1)-block, contraction χ×2.

Usage: python tools/make_measurement_pin.py [cell.pkl] [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def production_measurement(cell_path: str, N: int = 2):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
    from kagomeperiodicbp_tpu.algo.measurements import measure_energies_and_observables
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.physics import hamiltonians

    cell = UnitCell.load(cell_path).astype(jnp.complex128).force_zero_rotation()
    D = cell.D
    chi = 2 * D * D + 10
    n_m = N + 1
    bp_m = BPConfig(trunc_dim=2 * D * D, dtype=jnp.complex128).for_measurements(2.0)
    chi_m = chi * 2
    h = hamiltonians.BY_NAME["AFM"]()

    msgs, _ = robust_belief_propagation(cell, None, bp_m, n_m)
    meas = measure_energies_and_observables(cell, msgs, n_m, chi_m, bp_m.trunc_dim, h)
    return {
        "cell": os.path.basename(cell_path),
        "D": D,
        "N": n_m,
        "chi": chi_m,
        "chi_bp": bp_m.trunc_dim,
        "mean_energy": meas.mean_energy,
        "edge_energies": {k: float(v) for k, v in meas.energies.items()},
    }


def main():
    cell = sys.argv[1] if len(sys.argv) > 1 else "tests/assets/pin_D3.pkl"
    out = sys.argv[2] if len(sys.argv) > 2 else "tests/assets/pin_D3.json"
    res = production_measurement(cell)
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
