"""The fused (jitted) edge programs must agree with the eager,
oracle-validated path — they implement the same math in two code paths
(algo/fused._edge_env_traced duplicates algo/edge_env.edge_environment)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagomeperiodicbp_tpu.algo import contraction as C, edge_env as E, fused as F
from kagomeperiodicbp_tpu.enums import UpdateEdge
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.ops import ite_kernels as K
from kagomeperiodicbp_tpu.physics import hamiltonians

N, D, CHI, CHIM = 2, 2, 18, 8


def _setup():
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(8))
    msgs = C.initial_messages(N, D, CHIM, model="uniform")
    return cell, msgs


@pytest.mark.parametrize("edge", UpdateEdge.all_options()[:3], ids=str)
def test_fused_env_matches_eager(edge):
    cell, msgs = _setup()
    t1e, t2e, enve, _ = E.edge_environment(cell, msgs, N, CHI, CHIM, edge)
    rho_eager = np.asarray(K.rho_ij(t1e, t2e, enve))

    env_fn = F._edge_env_jit(N, D, CHI, CHIM, edge)
    cells = (cell.A, cell.B, cell.C)
    t1f, t2f, envf = env_fn(cells, F._msgs_to_sites(msgs))
    rho_fused = np.asarray(K.rho_ij(t1f, t2f, envf))
    np.testing.assert_allclose(rho_fused, rho_eager, atol=1e-10)


def test_fused_measure_matches_direct_rho():
    cell, msgs = _setup()
    h = jnp.asarray(hamiltonians.heisenberg_afm())
    edge = UpdateEdge.all_options()[0]
    t1, t2, env, _ = E.edge_environment(cell, msgs, N, CHI, CHIM, edge)
    rho = K.rho_ij(t1, t2, env)
    e_direct = complex(np.einsum("iIjJ,iIjJ->", np.asarray(rho), np.asarray(h)))

    measure = F.edge_measure(N, D, CHI, CHIM, edge)
    energy, neg, exps = measure((cell.A, cell.B, cell.C), F._msgs_to_sites(msgs), h)
    assert abs(complex(energy) - e_direct) < 1e-10
