"""Simple-update bootstrap + BP measurement cross-validation.

The published Kagome AFM simple-update energies (BASELINE.md / reference
scripts/plot/afmh_benchmarking.py:35): D=2 → −0.38620, D=3 → −0.41786.
Running our SU and measuring the resulting cell through the full
BP+sandwich-RDM pipeline must land near those values — this cross-validates
two independent subsystems against published physics.
"""
import jax
import numpy as np
import pytest

from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
from kagomeperiodicbp_tpu.algo.measurements import measure_energies_and_observables
from kagomeperiodicbp_tpu.algo.simple_update import simple_update
from kagomeperiodicbp_tpu.physics import hamiltonians


def test_su_d2_energy_close_to_published():
    h = hamiltonians.heisenberg_afm()
    steps = [0.1] * 150 + [0.01] * 150 + [1e-3] * 100
    cell, lambdas = simple_update(h, D=2, time_steps=steps, key=jax.random.PRNGKey(1))
    # λ spectra should be converged and normalised
    for lam in lambdas.values():
        assert abs(float(np.linalg.norm(np.asarray(lam))) - 1) < 1e-6

    bp_cfg = BPConfig(trunc_dim=8, max_iterations=40, msg_diff_terminate=1e-11)
    msgs, stats = robust_belief_propagation(cell, None, bp_cfg, N=2)
    assert stats.success
    meas = measure_energies_and_observables(cell, msgs, N=2, chi=18, chi_msg=8, h=h)
    # SU fixed point measured with BlockBP environments: close to the
    # published SU value −0.38620 (BP env ≠ SU env, so allow a few 1e-3)
    assert meas.mean_energy < -0.375, f"mean energy {meas.mean_energy}"
    assert meas.mean_energy > -0.42
