#!/usr/bin/env python
"""Cross-implementation residual audit (VERDICT r3 missing #4 / next #6).

Round-3 finding: measuring the reference's committed best D=2 cell with this
stack gives -0.40447, vs the -0.40464 encoded in their best-store filename —
a 2e-4 residual nobody had explained.

Hypothesis: the recorded energy's measurement block size. The reference's
best-store value is produced by `_calculate_unit_cell_measurements`
(/root/reference/src/algo/imaginary_time_evolution/main.py:210) under the
measurement transform `_config_at_measurement`
(/root/reference/scripts/run_ite.py:49-55): N -> N+1, chi x2, chi_bp x2,
tighter BP. Their run_ite default is N=3 (scripts/run_ite.py:161), so the
committed numbers are measured at block N_m = 4 — while our round-3
cross-check measured at N_m = 3.

This tool measures the SAME cell both ways at a range of measurement block
sizes:

  --side reference : run the reference's own BP + measurement code
                     (imported from /root/reference, quimb stubbed) on its
                     own best D=2 cell at measure-N in {3,4,5}.
  --side ours      : measure the identical cell (data/reference_checks pkl)
                     with this stack at the same measure-N and chi.

Matched-N agreement <= ~1e-6 proves implementation parity; the reference's
own N_m=4 value reproducing the filename energy pins the residual on the
recording convention, closing the audit.

Usage:
  python tools/residual_audit.py --side reference --measure-n 3 4
  python tools/residual_audit.py --side ours --measure-n 3 4
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "data", "residual_audit.json")


def _record(side: str, measure_n: int, chi: int, chi_bp: int, energy: float,
            seconds: float, extra: dict | None = None) -> None:
    try:
        with open(OUT) as fh:
            rows = json.load(fh)
    except Exception:
        rows = []
    row = {"side": side, "measure_n": measure_n, "chi": chi, "chi_bp": chi_bp,
           "energy_per_site": energy, "seconds": round(seconds, 1),
           "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    row.update(extra or {})
    rows = [r for r in rows
            if not (r["side"] == side and r["measure_n"] == measure_n
                    and r["chi"] == chi)] + [row]
    with open(OUT, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(json.dumps(row))


def run_reference(measure_ns: list[int], D: int, chi_factor: float = 1.0,
                  exact: bool = False) -> None:
    """Measure the reference's own best-store cell with the reference's own
    code, replicating _calculate_unit_cell_measurements + the measurement
    transform exactly (fresh TN at N_m, robust BP, energies together)."""
    from measure_reference_baseline import ensure_stub

    ensure_stub()
    import tempfile

    sys.path.insert(0, os.path.join(tempfile.gettempdir(), "kpbp_quimb_stub"))
    sys.path.insert(0, "/root/reference/src")
    sys.path.insert(0, "/root/reference")
    os.chdir(tempfile.gettempdir())

    from algo.belief_propagation import robust_belief_propagation
    from algo.measurements import measure_energies_and_observables_together
    from containers import Config
    from physics import hamiltonians
    from tensor_networks.construction import kagome_tn_from_unit_cell
    from unit_cell import UnitCell

    uc = UnitCell.load_best(D=D)
    assert uc is not None, "reference best-store cell not found"

    for n_m in measure_ns:
        # Base config at the run-time N (n_m - 1), then the exact
        # measurement transform from /root/reference/scripts/run_ite.py:49-55
        config = Config.derive_from_dimensions(D)
        config.dims.big_lattice_size = n_m - 1
        config.bp.msg_diff_good_enough = 1e-5
        config.bp.msg_diff_terminate = 1e-6
        config.ite.interaction_hamiltonian = (hamiltonians.heisenberg_afm,
                                              None, None)
        config.chi = config.chi * chi_factor
        config.chi_bp = config.chi_bp * chi_factor
        config.dims.big_lattice_size += 1
        config.bp.msg_diff_terminate /= 2
        config.bp.allowed_retries += 1
        config.chi_bp *= 2
        config.chi *= 2
        if exact:
            # the reference's own exactness protocol
            # (/root/reference/scripts/tests/bp.py:53-55): chi=40-class env,
            # terminate 1e-14 — the unique untruncated fixed point, where
            # implementations must agree to solver precision.
            config.chi_bp = max(config.chi_bp, 40)
            config.chi = max(config.chi, 50)
            config.bp.msg_diff_terminate = 1e-14
            config.bp.max_iterations = 300
        config.visuals.progress_bars = 'all_disabled'
        config.post_creation_fix()

        t0 = time.time()
        full_tn = kagome_tn_from_unit_cell(uc, config.dims)
        messages, _ = robust_belief_propagation(full_tn, None, config.bp)
        meas = measure_energies_and_observables_together(
            full_tn, config.ite.interaction_hamiltonian, config.contraction)
        _record("reference" + ("-exact" if exact else ""), n_m, config.chi,
                config.chi_bp, float(meas.mean_energy), time.time() - t0,
                {"energies": {str(k): float(v)
                              for k, v in meas.energies.items()}})


def run_ours(measure_ns: list[int], D: int, chi_factor: float = 1.0,
             exact: bool = False) -> None:
    """Measure the identical cell with this stack at matched N_m / chi."""
    from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
    from kagomeperiodicbp_tpu.algo.measurements import (
        measure_energies_and_observables)
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.physics.hamiltonians import heisenberg_afm
    from kagomeperiodicbp_tpu.utils.jaxtools import setup

    setup(platform="cpu", x64=True)
    cells = [f for f in os.listdir(os.path.join(HERE, "data", "reference_checks"))
             if f.startswith(f"D={D} ") and f.endswith(".pkl")]
    assert cells, "no reference-check cell for this D"
    cell = UnitCell.load(os.path.join(HERE, "data", "reference_checks", cells[0]))

    for n_m in measure_ns:
        chi = int(2 * (2 * D * D + 10) * chi_factor)
        chi_bp = int(2 * (2 * D * D) * chi_factor)
        terminate = 5e-7
        max_it = 50
        if exact:
            chi_bp, chi, terminate, max_it = max(chi_bp, 40), max(chi, 50), 1e-14, 300
        t0 = time.time()
        cfg = BPConfig(trunc_dim=chi_bp, msg_diff_terminate=terminate,
                       max_iterations=max_it, dtype=cell.A.dtype)
        msgs, stats = robust_belief_propagation(cell, None, cfg, n_m)
        meas = measure_energies_and_observables(cell, msgs, n_m, chi, chi_bp,
                                                heisenberg_afm())
        _record("ours" + ("-exact" if exact else ""), n_m, chi, chi_bp,
                float(meas.mean_energy), time.time() - t0,
                {"bp_err": float(stats.final_error),
                 "energies": {k: float(v) for k, v in meas.energies.items()}})


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--side", choices=["reference", "ours"], required=True)
    p.add_argument("--measure-n", type=int, nargs="+", default=[3, 4])
    p.add_argument("-D", type=int, default=2)
    p.add_argument("--chi-factor", type=float, default=1.0)
    p.add_argument("--exact", action="store_true",
                   help="exact-env protocol: chi>=40/50, terminate 1e-14")
    args = p.parse_args()
    sys.path.insert(0, os.path.join(HERE, "tools"))
    if args.side == "reference":
        run_reference(args.measure_n, args.D, args.chi_factor, args.exact)
    else:
        run_ours(args.measure_n, args.D, args.chi_factor, args.exact)


if __name__ == "__main__":
    main()
