#!/usr/bin/env python
"""Square-lattice ground-state search: simple-update ITE + BlockBP
measurement (the reference's legacy squareITE.py workflow,
/root/reference/src/libs/squareITE.py:3393 `_main_test`).

Example:
    python scripts/run_square.py -D 2 -m 2 -n 4 --platform cpu
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-D", type=int, default=2, help="virtual bond dimension")
    p.add_argument("-m", type=int, default=2, help="unit-cell linear size")
    p.add_argument("-n", type=int, default=4, help="measurement block size")
    p.add_argument("--hamiltonian", default="AFM", help="AFM | FM")
    p.add_argument("--dt-start", type=float, default=0.1)
    p.add_argument("--dt-stop", type=float, default=0.001)
    p.add_argument("--sweeps-per-dt", type=int, default=60)
    p.add_argument("--staggered-field", type=float, default=0.4)
    p.add_argument("--chi-factor", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--full-update", action="store_true",
                   help="polish the SU state with the BP-environment full "
                        "update (square/fullupdate.py; reference "
                        "squareITE.py:2091 environment mode)")
    p.add_argument("--fu-sweeps", type=int, default=6)
    p.add_argument("--fu-dt-start", type=float, default=0.05)
    p.add_argument("--fu-dt-stop", type=float, default=0.002)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    # after the platform switch — else the sitecustomize axon pin disables
    # the persistent compile cache even for --platform cpu runs
    from kagomeperiodicbp_tpu.utils.jaxtools import enable_compilation_cache
    enable_compilation_cache()

    from kagomeperiodicbp_tpu.physics import hamiltonians
    from kagomeperiodicbp_tpu.square import algo as S

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("run_square")

    h = hamiltonians.BY_NAME[args.hamiltonian]()

    dts = []
    dt = args.dt_start
    while dt >= args.dt_stop * 0.999:
        dts.append(dt)
        dt /= 2
    log.info("SU ladder: %s", [f"{d:.4f}" for d in dts])

    cell, lams = S.simple_update(
        h, D=args.D, m=args.m, dts=tuple(dts),
        sweeps_per_dt=args.sweeps_per_dt,
        key=jax.random.PRNGKey(args.seed),
        staggered_field=args.staggered_field,
    )
    chi_msg = int(2 * args.D**2 * args.chi_factor)
    chi = chi_msg + 10
    msgs, err = S.belief_propagation(cell, args.n, args.D, chi_msg=chi_msg,
                                     chi=chi, max_iterations=60)
    log.info("BP converged to %.3e", err)
    e = S.measure_energy(cell, args.n, args.D, msgs, chi, chi_msg, h)
    log.info("energy/site = %.8f  (square AFM refs: Néel −0.5, "
             "SU D=2 ≈ −0.60, exact ≈ −0.6694)", e)

    if args.full_update:
        from kagomeperiodicbp_tpu.square import fullupdate as FU

        dts = []
        dt = args.fu_dt_start
        while dt >= args.fu_dt_stop * 0.999:
            dts.append(dt)
            dt /= 2
        log.info("FU ladder: %s × %d sweeps", [f"{d:.4f}" for d in dts],
                 args.fu_sweeps)
        cell, e_fu, hist = FU.full_update(
            cell, h, n=args.n, dts=tuple(dts), sweeps_per_dt=args.fu_sweeps,
            chi=chi, chi_msg=chi_msg, logger=log)
        log.info("full-update energy/site = %.8f (SU was %.8f, exact −0.6694)",
                 e_fu, e)
        return e_fu
    return e


if __name__ == "__main__":
    main()
