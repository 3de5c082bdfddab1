"""Square-lattice full update: bond environment correctness + energy descent.

The bond-environment RDM path is validated against `pair_expectation`, which
is itself pinned to the exact dense contraction in test_square.py — so
agreement here chains back to the dense oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagomeperiodicbp_tpu.physics import hamiltonians
from kagomeperiodicbp_tpu.square import algo as S
from kagomeperiodicbp_tpu.square import fullupdate as FU
from kagomeperiodicbp_tpu.square.lattice import site_index


def _random_cell(m, D, d=2, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), m * m)
    cell = [[jax.random.normal(keys[i * m + j], (d, D, D, D, D),
                               dtype=jnp.float64).astype(jnp.complex128)
             for j in range(m)] for i in range(m)]
    return [[t / jnp.linalg.norm(t) for t in row] for row in cell]


@pytest.mark.parametrize("orient", ["h", "v"])
def test_bond_rdm_matches_sandwich_expectation(orient):
    """⟨h⟩ from the chain-ladder bond RDM == the RDM-free full-sandwich
    value (dense-oracle-pinned) on a BP-converged random cell."""
    n, m, D = 4, 2, 2
    chi_msg = 2 * D * D
    chi = 256  # machine-exact: both paths must agree to ~eps, not to O(χ-truncation)
    cell = _random_cell(m, D, seed=3)
    h = hamiltonians.heisenberg_afm()
    msgs, err = S.belief_propagation(cell, n, D, chi_msg, chi=chi,
                                     max_iterations=60)
    assert err < 1e-9

    c = max((n - m - 1) // 2, 0)
    for di, dj in [(0, 0), (1, 1)]:
        i, j = c + di, c + dj
        e_rdm = FU.bond_expectation(cell, n, D, msgs, chi, chi_msg, h,
                                    orient, i, j)
        v1, v2 = FU.bond_pair(n, orient, i, j)
        e_sw = S.pair_expectation(cell, n, D, msgs, chi, chi_msg, h, v1, v2)
        assert abs(e_rdm - e_sw) < 1e-8, (orient, i, j, e_rdm, e_sw)


def test_full_update_improves_su_state():
    """A short full-update polish from a simple-update start must lower the
    energy (SU D=2 ≈ −0.60 at short schedules; FU moves toward −0.6694)."""
    n, m, D = 4, 2, 2
    h = hamiltonians.heisenberg_afm()
    cell, _ = S.simple_update(h, D=D, m=m, dts=(0.1, 0.05, 0.02),
                              sweeps_per_dt=30, key=jax.random.PRNGKey(0))
    chi_msg = 2 * D * D
    chi = chi_msg + 10
    msgs, _ = S.belief_propagation(cell, n, D, chi_msg, chi=chi,
                                   max_iterations=60)
    e_su = S.measure_energy(cell, n, D, msgs, chi, chi_msg, h)

    cell2, e_fu, hist = FU.full_update(
        cell, h, n=n, dts=(0.05, 0.02), sweeps_per_dt=4,
        chi=chi, chi_msg=chi_msg, bp_iters=40, bp_tol=1e-7)
    assert np.isfinite(e_fu)
    assert e_fu < e_su + 1e-9, (e_fu, e_su)
    # physical window for the square Heisenberg AFM
    assert -0.70 < e_fu < -0.55, e_fu
