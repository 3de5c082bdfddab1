"""Square-lattice engine: plans vs dense oracle, product-state exactness,
BP convergence, and simple-update physics (reference: libs/squareITE.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagomeperiodicbp_tpu.networks.unit_cell import fused_tensor
from kagomeperiodicbp_tpu.ops import exact
from kagomeperiodicbp_tpu.physics import hamiltonians
from kagomeperiodicbp_tpu.planner.compiler import sweep_order
from kagomeperiodicbp_tpu.square import algo as S
from kagomeperiodicbp_tpu.square.lattice import SquareSide, site_index

BIG = 10**6


def _random_cell(m=2, D=2, d=2, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), m * m)
    cell = [
        [
            (lambda t: t / jnp.linalg.norm(t))(
                jax.random.normal(keys[i * m + j], (d, D, D, D, D), dtype=jnp.float64)
                + 1j * jax.random.normal(jax.random.fold_in(keys[i * m + j], 7),
                                         (d, D, D, D, D), dtype=jnp.float64)
            )
            for j in range(m)
        ]
        for i in range(m)
    ]
    return cell


def test_square_scalar_matches_dense_oracle():
    n, D = 2, 2
    cell = _random_cell(m=2, D=D)
    msgs = S.initial_messages(n, D, chi=BIG, model="random",
                              key=jax.random.PRNGKey(5))
    msg_sites = {int(s): tuple(m.sites) for s, m in msgs.items()}
    v_eng_m, v_eng_l = S._scalar(cell, n, D, msg_sites, BIG, BIG)
    v_engine = v_eng_m * np.exp(v_eng_l)

    graph = S._graph_for(n, D, BIG, tuple(int(s) for s in SquareSide))

    def fetch(src):
        if src[0] == "lat":
            i, j = divmod(src[1], n)
            return np.asarray(fused_tensor(cell[i % 2][j % 2]))
        _, side, k = src
        return np.asarray(msgs[SquareSide(side)].sites[k])

    order = sweep_order(graph, SquareSide.UP)
    env, open_legs = exact.contract_dense(graph, fetch, order)
    assert not open_legs
    mlog = sum(float(m.logscale) for m in msgs.values())
    v_oracle = complex(env) * np.exp(mlog)
    np.testing.assert_allclose(v_engine, v_oracle, rtol=1e-9)


def _product_cell(m=2, D=2):
    t = jnp.zeros((2, D, D, D, D), dtype=jnp.complex128)
    t = t.at[0, 0, 0, 0, 0].set(1.0)
    return [[t for _ in range(m)] for _ in range(m)]


def test_square_product_state_energy_exact():
    """|↑…↑⟩: ⟨S·S⟩ = ¼ per bond → energy/site = ½ exactly (2 bonds/site)."""
    n, D = 4, 2
    cell = _product_cell()
    msgs, err = S.belief_propagation(cell, n, D, chi_msg=8, max_iterations=20)
    h = hamiltonians.heisenberg_afm()
    e = S.measure_energy(cell, n, D, msgs, 16, 8, h)
    assert abs(e - 0.5) < 1e-8


def test_square_bp_converges_random():
    n, D = 3, 2
    cell = _random_cell(m=1, D=D, seed=3)
    msgs, err = S.belief_propagation(cell, n, D, chi_msg=8, max_iterations=40)
    assert err < 1e-5


def test_square_simple_update_afm_physics():
    """SU on the 2×2 cell must land near the known square-lattice AFM
    Heisenberg energies (S·S units): SU D=2 ≈ −0.60/site; clearly below the
    classical Néel value −0.5 and above the exact GS −0.6694."""
    h = hamiltonians.heisenberg_afm()
    cell, lams = S.simple_update(h, D=2, m=2, dts=(0.1, 0.05, 0.01),
                                 sweeps_per_dt=50, key=jax.random.PRNGKey(1))
    n = 4
    msgs, err = S.belief_propagation(cell, n, 2, chi_msg=10, max_iterations=30)
    e = S.measure_energy(cell, n, 2, msgs, 20, 10, h)
    assert e < -0.5, e        # beats the classical Néel state
    assert e > -0.70, e       # above the exact ground state
