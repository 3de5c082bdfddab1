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


if __name__ == "__main__":
    main()
