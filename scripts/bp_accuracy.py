#!/usr/bin/env python
"""Environment-method accuracy comparison: {random, bp, exact} envs on the
same unit cell — per-edge RDM fidelity vs the exact env, energy, ⟨z⟩,
negativity, entanglement entropy, to CSV.

TPU-native analog of the reference's scripts/tests/bp.py
`_per_D_N_single_test` (:99): "exact" there is BP with χ=40 / terminate
1e-14 (:53-55); the fidelity/energy/negativity report table is :145-177,
rows to CSV via CSVRowData (:58). Here the same protocol runs on the static
plans (x64 CPU), with the exact env's χ and termination configurable.

Usage:
  python scripts/bp_accuracy.py -D 2 -N 2 [--seed 0] [--exact-chi 40]
                                [--out data/bp_accuracy.csv]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-D", type=int, default=2)
    p.add_argument("-N", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--exact-chi", type=int, default=40)
    p.add_argument("--chi", type=int, default=None,
                   help="production env chi (default 2D^2)")
    p.add_argument("--out", default="data/bp_accuracy.csv")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from kagomeperiodicbp_tpu.utils.jaxtools import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from kagomeperiodicbp_tpu.algo import contraction as C, edge_env as E
    from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
    from kagomeperiodicbp_tpu.enums import UpdateEdge
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.ops import ite_kernels as K
    from kagomeperiodicbp_tpu.physics import metrics as M
    from kagomeperiodicbp_tpu.physics.hamiltonians import heisenberg_afm
    from kagomeperiodicbp_tpu.utils.csvs import CSVManager

    D, N = args.D, args.N
    chi = args.chi or 2 * D * D
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(args.seed))
    h = heisenberg_afm()
    sz = np.diag([0.5, -0.5])

    def env_messages(method: str):
        if method == "random":
            return C.initial_messages(N, D, chi=chi, model="random",
                                      key=jax.random.PRNGKey(args.seed + 11))
        if method == "bp":
            cfg = BPConfig(trunc_dim=chi)
            msgs, stats = robust_belief_propagation(cell, None, cfg, N)
            print(f"  bp converged: err={stats.final_error:.3e} "
                  f"iters={stats.iterations}")
            return msgs
        # exact: high-chi, tight termination (reference bp.py:53-55)
        cfg = BPConfig(trunc_dim=args.exact_chi, msg_diff_terminate=1e-14,
                       max_iterations=200)
        msgs, stats = robust_belief_propagation(cell, None, cfg, N)
        print(f"  exact-env BP: err={stats.final_error:.3e} "
              f"iters={stats.iterations}")
        return msgs

    def edge_rhos(msgs, env_chi):
        rhos = {}
        for edge in UpdateEdge.all_options():
            t1, t2, env, _ = E.edge_environment(cell, msgs, N, chi=env_chi,
                                                chi_msg=env_chi, edge=edge)
            rho = np.asarray(K.rho_ij(t1, t2, env))
            rhos[str(edge)] = rho / np.trace(np.trace(rho, axis1=2, axis2=3)).real
        return rhos

    print(f"bp_accuracy D={D} N={N} chi={chi} exact_chi={args.exact_chi}")
    t0 = time.time()
    print("computing exact-env reference ...")
    exact_rhos = edge_rhos(env_messages("exact"), args.exact_chi)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    csv = CSVManager(args.out, [
        "D", "N", "chi", "method", "edge", "fidelity_vs_exact", "energy",
        "z_i", "negativity", "entropy", "hermicity",
    ])

    for method in ("random", "bp", "exact"):
        print(f"method={method} ...")
        msgs = env_messages(method)
        env_chi = args.exact_chi if method == "exact" else chi
        rhos = edge_rhos(msgs, env_chi)
        for edge_name, rho in rhos.items():
            mat = M.rho_tensor_to_matrix(rho)
            ref = M.rho_tensor_to_matrix(exact_rhos[edge_name])
            fid = M.fidelity(mat, ref)
            # h is [i_ket, i_bra, j_ket, j_bra] like rho (pauli.two_site)
            h_mat = M.rho_tensor_to_matrix(np.asarray(h))
            energy = float(np.real(np.trace(mat @ h_mat)))
            # single-site <z> on the first site of the pair
            rho_i = np.trace(rho, axis1=2, axis2=3)
            z_i = float(np.real(np.trace(rho_i @ sz)))
            row = {
                "D": D, "N": N, "chi": env_chi, "method": method,
                "edge": edge_name,
                "fidelity_vs_exact": round(fid, 10),
                "energy": round(energy, 10),
                "z_i": round(z_i, 10),
                "negativity": round(M.negativity(mat), 10),
                "entropy": round(M.entanglement_entropy(mat), 10),
                "hermicity": round(M.hermicity(mat), 12),
            }
            csv.append(row)
            print(f"  {edge_name}: fid={fid:.8f} E={energy:+.6f} "
                  f"neg={row['negativity']:.4f}")
    print(f"done in {time.time() - t0:.0f}s -> {args.out}")


if __name__ == "__main__":
    main()
