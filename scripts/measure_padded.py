#!/usr/bin/env python
"""Bond-dimension-annealed RECORD measurement: load the best-store cell of a
smaller D, zero-pad (+noise) to the target D, and measure at the production
convention (block N+1, χ×2, fresh robust BP) — the same convention
`full_ite` records, so the result is a valid best-store entry.

This is the measurement half of `run_ite --cell pad:<D>` without paying for
ITE segments first: the padded state's energy equals the source state's
(the pad is exact), so it seeds the target-D record book immediately;
subsequent ITE runs improve on it.

Usage: python scripts/measure_padded.py -D 5 [--src 4] [-N 2] [--noise 0.03]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-D", type=int, required=True, help="target bond dimension")
    p.add_argument("--src", type=int, default=None, help="source D (default D-1)")
    p.add_argument("-N", type=int, default=2, help="base block (measures at N+1)")
    p.add_argument("--noise", type=float, default=0.03,
                   help="pad noise fraction (full-rank bonds)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chi-factor", type=float, default=2.0)
    p.add_argument("--no-store", action="store_true")
    p.add_argument("--bp-dtype", default="complex128",
                   choices=["complex64", "complex128"],
                   help="run the (dominant-cost) BP fixed-point search in "
                        "this dtype; complex64 halves the flop bill and is "
                        "followed by a short complex128 warm-start polish "
                        "before the f64 measurement (the mixed-precision "
                        "scheme validated to 1.6e-7 drift in round 4)")
    args = p.parse_args(argv)

    import logging

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    # the dominant cost of a first-time D≥4 production measurement on this
    # machine is x64 XLA compiles (5-10 min per escalated BP program on one
    # core) — persist them so reruns and ITE runs share the work
    from kagomeperiodicbp_tpu.utils.jaxtools import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
    from kagomeperiodicbp_tpu.algo.measurements import measure_energies_and_observables
    from kagomeperiodicbp_tpu.physics import hamiltonians
    from kagomeperiodicbp_tpu.utils.best_store import load_best, save_if_best

    src = args.src or args.D - 1
    rec = load_best(src)
    if rec is None:
        raise SystemExit(f"no best-store record for D={src}")
    cell = rec[0].astype(jnp.complex128).pad_to(
        args.D, noise_fraction=args.noise, key=jax.random.PRNGKey(args.seed))

    D = args.D
    chi = 2 * D * D + 10
    n_m = args.N + 1
    bp_m = BPConfig(trunc_dim=2 * D * D, dtype=jnp.complex128).for_measurements(
        args.chi_factor)
    chi_m = int(chi * args.chi_factor)
    h = hamiltonians.BY_NAME["AFM"]()

    cell = cell.force_zero_rotation()
    if args.bp_dtype == "complex64":
        # bulk of the fixed-point search in c64, then a short c128 polish
        # from the converged messages (warm start ⇒ few iterations)
        bp_lo = dataclasses.replace(bp_m, dtype=jnp.complex64)
        msgs, stats = robust_belief_propagation(
            cell.astype(jnp.complex64), None, bp_lo, n_m)
        msgs = {k: type(m)(tuple(s.astype(jnp.complex128) for s in m.sites),
                           m.logscale.astype(jnp.float64))
                for k, m in msgs.items()}
        bp_polish = dataclasses.replace(bp_m, max_iterations=12)
        msgs, stats = robust_belief_propagation(cell, msgs, bp_polish, n_m)
    else:
        msgs, stats = robust_belief_propagation(cell, None, bp_m, n_m)
    meas = measure_energies_and_observables(cell, msgs, n_m, chi_m, bp_m.trunc_dim, h)
    out = {
        "D": D, "src_D": src, "src_energy": rec[1],
        "N": n_m, "chi": chi_m, "chi_bp": bp_m.trunc_dim,
        "mean_energy": meas.mean_energy,
        "bp_error": stats.final_error,
        "edge_energies": {k: float(v) for k, v in meas.energies.items()},
    }
    print(json.dumps(out), flush=True)
    if not args.no_store:
        save_if_best(cell, meas.mean_energy, D)
    return 0


if __name__ == "__main__":
    sys.exit(main())
