#!/usr/bin/env python
"""Measure a fixed unit cell on blocks of increasing size N — the
"enlarged Core-block measurements" workflow and N-convergence harness.

(reference: /root/reference/scripts/increasing_block_measurements.py:24 and
measurements.run_converged_measurement_test, measurements.py:346)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cell", default="random", help="random | zero | <path.pkl>")
    p.add_argument("-D", type=int, default=2)
    p.add_argument("--n-min", type=int, default=2)
    p.add_argument("--n-max", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="complex128")
    p.add_argument("--csv", default="data/measurements/n_scaling.csv")
    args = p.parse_args(argv)

    import jax

    from kagomeperiodicbp_tpu.utils.jaxtools import enable_compilation_cache
    enable_compilation_cache()
    if args.dtype in ("complex128", "float64"):
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
    from kagomeperiodicbp_tpu.algo.measurements import measure_energies_and_observables
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.physics import hamiltonians
    from kagomeperiodicbp_tpu.utils.csvs import CSVManager

    dtype = {"complex64": jnp.complex64, "complex128": jnp.complex128}[args.dtype]
    if args.cell == "random":
        cell = UnitCell.random(d=2, D=args.D, key=jax.random.PRNGKey(args.seed), dtype=dtype)
    elif args.cell == "zero":
        cell = UnitCell.zero_product_state(d=2, D=args.D, dtype=dtype)
    else:
        cell = UnitCell.load(args.cell).astype(dtype)

    h = hamiltonians.heisenberg_afm()
    csvm = CSVManager(args.csv, ["N", "D", "mean_energy", "bp_error", "bp_iters"])
    out = []
    for N in range(args.n_min, args.n_max + 1):
        bp_cfg = BPConfig(trunc_dim=2 * args.D**2, dtype=dtype)
        msgs, stats = robust_belief_propagation(cell, None, bp_cfg, N)
        meas = measure_energies_and_observables(
            cell, msgs, N, chi=2 * args.D**2 + 10, chi_msg=bp_cfg.trunc_dim, h=h
        )
        row = dict(N=N, D=args.D, mean_energy=meas.mean_energy,
                   bp_error=stats.final_error, bp_iters=stats.iterations)
        csvm.append(row)
        out.append(row)
        print(json.dumps(row))
    return out


if __name__ == "__main__":
    main()
