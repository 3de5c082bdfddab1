"""Symmetry tests: measurements must be invariant under unit-cell rotation
(the reference's scripts/tests/rotating_unit_cell.py)."""
import jax
import numpy as np
import pytest

from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
from kagomeperiodicbp_tpu.algo.measurements import measure_energies_and_observables
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.physics import hamiltonians


def _energy(cell, N=2):
    h = hamiltonians.heisenberg_afm()
    bp_cfg = BPConfig(trunc_dim=8, max_iterations=40, msg_diff_terminate=1e-11)
    msgs, stats = robust_belief_propagation(cell, None, bp_cfg, N)
    assert stats.success
    meas = measure_energies_and_observables(cell, msgs, N, chi=18, chi_msg=8, h=h)
    return meas


def test_rotation_invariance_of_measurements():
    cell = UnitCell.random(d=2, D=2, key=jax.random.PRNGKey(11))
    m0 = _energy(cell)
    m1 = _energy(cell.rotate_ccw())
    m2 = _energy(cell.rotate_ccw().rotate_ccw())
    # mean energy per site is a lattice scalar — rotation invariant
    assert abs(m0.mean_energy - m1.mean_energy) < 1e-7, (m0.mean_energy, m1.mean_energy)
    assert abs(m0.mean_energy - m2.mean_energy) < 1e-7
    # triple rotation = identity
    cell3 = cell.rotate_ccw().rotate_ccw().rotate_ccw()
    np.testing.assert_allclose(np.asarray(cell3.A), np.asarray(cell.A), atol=1e-14)
    np.testing.assert_allclose(np.asarray(cell3.B), np.asarray(cell.B), atol=1e-14)
    np.testing.assert_allclose(np.asarray(cell3.C), np.asarray(cell.C), atol=1e-14)
    # per-edge energies permute: in-core edges map (A,B)→(B,C)→(C,A)
    e0 = m0.energies
    e1 = m1.energies
    assert abs(e0["(A,B)"] - e1["(B,C)"]) < 1e-7
    assert abs(e0["(B,C)"] - e1["(C,A)"]) < 1e-7
    assert abs(e0["(C,A)"] - e1["(A,B)"]) < 1e-7
