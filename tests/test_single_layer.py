"""Single-layer ket swallowing (reference bubblecon.py:1855 swallow_ket_T):
the executor mode must be numerically identical to the double-layer path —
same plan, same truncations, only the swallow contraction is reordered."""
import jax
import jax.numpy as jnp
import numpy as np

from kagomeperiodicbp_tpu.lattices import BlockSide
from kagomeperiodicbp_tpu.algo import contraction as C
from kagomeperiodicbp_tpu.algo import fused as F
from kagomeperiodicbp_tpu.algo.bp import BPConfig, belief_propagation
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.ops import mps as mpslib
from kagomeperiodicbp_tpu.ops.contract import execute_plan

BIG = 10**6


def test_single_layer_message_exact_no_truncation():
    N, D = 2, 2
    cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(0))
    msgs = C.initial_messages(N, D, chi=BIG, model="random", key=jax.random.PRNGKey(7))
    for toward in BlockSide:
        m_d = C.outgoing_message(cell, msgs, N, D, BIG, BIG, toward)
        m_s = C.outgoing_message_single(cell, msgs, N, D, BIG, BIG, toward)
        assert float(mpslib.distance(m_d, m_s)) < 1e-10


def test_single_layer_identical_under_truncation():
    """With truncation active the two modes still agree to fp precision:
    identical plans → identical truncation points → identical SVDs."""
    N, D = 2, 3
    chi = 12
    cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(1))
    msgs = C.initial_messages(N, D, chi=chi, model="random", key=jax.random.PRNGKey(3))
    for toward in (BlockSide.U, BlockSide.DR):
        m_d = C.outgoing_message(cell, msgs, N, D, chi, chi, toward)
        m_s = C.outgoing_message_single(cell, msgs, N, D, chi, chi, toward)
        assert float(mpslib.distance(m_d, m_s)) < 1e-9


def test_single_layer_scalar_plan():
    N, D = 2, 2
    cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(2))
    msgs = C.initial_messages(N, D, chi=BIG, model="random", key=jax.random.PRNGKey(5))
    plan = C.full_scalar_plan(N, D, chi=BIG, chi_msg=BIG)
    m1, l1 = C.run_plan(plan, cell, msgs)
    msg_sites = {int(s): tuple(m.sites) for s, m in msgs.items()}
    sp = C.single_layer_plan(plan)
    m2, l2 = execute_plan(sp, C._make_fetch(None, msg_sites,
                                            kets=(cell.A, cell.B, cell.C)))
    extra = sum(float(m.logscale) for m in msgs.values())
    v1 = complex(m1) * np.exp(float(l1))
    v2 = complex(m2) * np.exp(float(l2) + extra)
    np.testing.assert_allclose(v1, v2, rtol=1e-10)


def test_bp_fixed_point_single_layer():
    """BP with single_layer=True converges to the same message fixed point."""
    N, D = 2, 2
    cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(4))
    cfg_d = BPConfig(trunc_dim=8, max_iterations=40, single_layer=False)
    cfg_s = BPConfig(trunc_dim=8, max_iterations=40, single_layer=True, batched=False)
    msgs_d, st_d = belief_propagation(cell, None, cfg_d, N)
    msgs_s, st_s = belief_propagation(cell, None, cfg_s, N)
    assert st_d.success and st_s.success
    for side in BlockSide:
        assert float(mpslib.distance(msgs_d[side], msgs_s[side])) < 1e-7
