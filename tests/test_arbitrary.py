"""Arbitrary per-site blocks: tiling a unit cell into individual site
tensors must reproduce the unit-cell pipeline exactly, including under
lattice-shift averaging (reference: scripts/tests/arbitrary_kagome_tensors.py)."""
import jax
import numpy as np
import pytest

from kagomeperiodicbp_tpu.algo.arbitrary import ArbitraryKagomeTN, all_shift_permutations
from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
from kagomeperiodicbp_tpu.algo.measurements import measure_energies_and_observables
from kagomeperiodicbp_tpu.lattices import triangle
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.physics import hamiltonians

N, D = 2, 2


def test_tiled_cell_matches_unit_cell_path():
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(5))
    h = hamiltonians.heisenberg_afm()

    bp_cfg = BPConfig(trunc_dim=8, max_iterations=30, msg_diff_terminate=1e-11)
    msgs, _ = robust_belief_propagation(cell, None, bp_cfg, N)
    ref = measure_energies_and_observables(cell, msgs, N, chi=18, chi_msg=8, h=h)

    tn = ArbitraryKagomeTN.from_unit_cell(cell, N)
    got = tn.measure(h, bp_config=bp_cfg, chi=18)
    assert abs(got.mean_energy - ref.mean_energy) < 1e-9


def test_shift_permutations_group():
    perms = all_shift_permutations(N)
    nt = triangle.total_vertices(N)
    assert len(perms) == nt
    # each is a true permutation
    for p in perms:
        assert sorted(p) == list(range(3 * nt))


def test_shift_average_of_tiled_cell_is_invariant():
    """Shifting a tiled unit cell is a no-op (all sites identical per
    flavor), so the shift average must equal the single measurement."""
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(6))
    h = hamiltonians.heisenberg_afm()
    tn = ArbitraryKagomeTN.from_unit_cell(cell, N)
    bp_cfg = BPConfig(trunc_dim=8, max_iterations=30, msg_diff_terminate=1e-11)
    single = tn.measure(h, bp_config=bp_cfg, chi=18)
    avg = tn.measure(h, bp_config=bp_cfg, chi=18, average_shifts=True)
    assert abs(single.mean_energy - avg.mean_energy) < 1e-9
