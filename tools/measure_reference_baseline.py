#!/usr/bin/env python
"""Measure the reference implementation's BP sweep time on this machine.

Runs NGBigField/KagomePeriodicBP (mounted at /root/reference) with a minimal
quimb stub (it only needs `rsvd`; we back it with a full SVD), and times
`belief_propagation` at the bench configuration.

Usage: python tools/measure_reference_baseline.py [D] [N] [chi] [iters]
"""
import os
import sys
import tempfile
import time

STUB = os.path.join(tempfile.gettempdir(), "kpbp_quimb_stub")


def ensure_stub():
    os.makedirs(os.path.join(STUB, "quimb", "linalg"), exist_ok=True)
    open(os.path.join(STUB, "quimb", "__init__.py"), "w").close()
    open(os.path.join(STUB, "quimb", "linalg", "__init__.py"), "w").close()
    with open(os.path.join(STUB, "quimb", "linalg", "rand_linalg.py"), "w") as fh:
        fh.write(
            "import numpy as np\n"
            "def rsvd(A, eps_or_k, **kwargs):\n"
            "    U, s, VT = np.linalg.svd(A, full_matrices=False)\n"
            "    if isinstance(eps_or_k, int):\n"
            "        k = min(eps_or_k, s.size)\n"
            "    else:\n"
            "        k = max(1, int((s > eps_or_k * s[0]).sum()))\n"
            "    return U[:, :k], s[:k], VT[:k]\n"
        )


def main():
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    chi = int(sys.argv[3]) if len(sys.argv) > 3 else 2 * D * D
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 6

    ensure_stub()
    sys.path.insert(0, STUB)
    sys.path.insert(0, "/root/reference/src")
    sys.path.insert(0, "/root/reference")
    os.chdir(tempfile.gettempdir())

    import numpy as np

    from unit_cell import UnitCell
    from tensor_networks.construction import create_repeated_kagome_tn
    from algo.belief_propagation import belief_propagation, BPConfig

    np.random.seed(0)
    uc = UnitCell.random(d=2, D=D)
    tn = create_repeated_kagome_tn(2, D, N, uc)
    cfg = BPConfig(trunc_dim=chi, max_iterations=iters,
                   msg_diff_terminate=1e-30, parallel_msgs=False)
    t0 = time.time()
    _, stats = belief_propagation(tn, None, cfg)
    dt = time.time() - t0
    per_sweep = dt / stats.iterations
    print(f"reference BP: D={D} N={N} chi={chi}: {stats.iterations} sweeps "
          f"in {dt:.2f}s -> {per_sweep:.3f}s/sweep")

    # persist the bench-config baseline so bench.py's vs_baseline is a
    # number measured on THIS machine, not a hard-coded constant
    if (D, N, chi) == (3, 2, 18):
        import json

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = os.path.join(here, "data", "reference_baseline.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as fh:
            json.dump({"D": D, "N": N, "chi": chi,
                       "seconds_per_sweep": per_sweep,
                       "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())},
                      fh)
        print(f"wrote {out}")


def main_ite():
    """Time the reference's per-edge ITE work unit (given converged messages):
    reduce_tn(ModeTN -> EdgeTN) + canonical rearrange + ite_update_unit_cell
    (reference: main.py:579-583, _tn_update.py:165).

    Usage: python tools/measure_reference_baseline.py --ite [D] [N]
    Writes `seconds_per_ite_step` into data/reference_baseline.json when the
    configuration matches bench.py's (D=3, N=2).
    """
    args = [a for a in sys.argv[1:] if a != "--ite"]
    D = int(args[0]) if len(args) > 0 else 3
    N = int(args[1]) if len(args) > 1 else 2

    ensure_stub()
    sys.path.insert(0, STUB)
    sys.path.insert(0, "/root/reference/src")
    sys.path.insert(0, "/root/reference")
    os.chdir(tempfile.gettempdir())

    import numpy as np

    from algo.belief_propagation import BPConfig, robust_belief_propagation
    from algo.imaginary_time_evolution._tn_update import ite_update_unit_cell
    from algo.tn_reduction import reduce_tn
    from containers import Config, UpdateEdge
    from enums import UpdateMode
    from tensor_networks import EdgeTN, ModeTN
    from tensor_networks.construction import kagome_tn_from_unit_cell
    from unit_cell import UnitCell
    from utils import logs

    np.random.seed(0)
    config = Config.derive_from_dimensions(D)
    config.dims.big_lattice_size = N
    config.bp = BPConfig(trunc_dim=2 * D * D, max_iterations=16,
                         msg_diff_terminate=1e-6, parallel_msgs=False)
    uc = UnitCell.random(d=2, D=D)
    full_tn = kagome_tn_from_unit_cell(uc, config.dims)
    messages, _ = robust_belief_propagation(full_tn, None, config.bp)
    mode_tn = reduce_tn(full_tn, ModeTN, contract_config=config.contraction,
                        mode=UpdateMode.A)
    logger = logs.get_logger(verbose=False, write_to_file=False)

    edges = list(UpdateEdge.all_options())[:3]
    t0 = time.time()
    for edge_tuple in edges:
        edge_tn = reduce_tn(mode_tn, EdgeTN, contract_config=config.contraction,
                            edge_tuple=edge_tuple, arange_legs=False)
        perm = edge_tn.rearrange_tensors_and_legs_into_canonical_order()
        uc, _, _ = ite_update_unit_cell(edge_tn, uc, perm, config.ite, 1e-3, logger)
    per_step = (time.time() - t0) / len(edges)
    print(f"reference ITE edge step: D={D} N={N} chi={config.chi}: "
          f"{per_step:.3f}s/step (mode->edge + rearrange + update, "
          f"messages pre-converged)")

    if (D, N) == (3, 2):
        import json

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = os.path.join(here, "data", "reference_baseline.json")
        try:
            with open(out) as fh:
                rec = json.load(fh)
        except Exception:
            rec = {"D": D, "N": N}
        rec["seconds_per_ite_step"] = per_step
        rec["ite_measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(out, "w") as fh:
            json.dump(rec, fh)
        print(f"wrote {out}")


if __name__ == "__main__":
    if "--ite" in sys.argv:
        main_ite()
    else:
        main()
