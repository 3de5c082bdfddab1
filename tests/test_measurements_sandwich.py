"""Full-sandwich expectation path vs dense oracle + classical message models
(reference: measurements.py:419-519, tensor_networks/mps.py:160)."""
import jax
import numpy as np
import pytest

from kagomeperiodicbp_tpu.lattices import BlockSide
from kagomeperiodicbp_tpu.algo import contraction as C
from kagomeperiodicbp_tpu.algo.measurements import measure_xyz_sandwich, sandwich_expectation
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell, fused_tensor_with_operator
from kagomeperiodicbp_tpu.ops import exact, mps as mpslib
from kagomeperiodicbp_tpu.physics import pauli
from kagomeperiodicbp_tpu.planner.compiler import sweep_order

BIG = 10**6


def test_sandwich_z_on_product_state_is_exact():
    """|0…0⟩ product cell: ⟨z⟩ = 1 exactly at every site, any environment."""
    cell = UnitCell.zero_product_state(2, 2)
    msgs = C.initial_messages(2, 2, chi=BIG, model="random", key=jax.random.PRNGKey(3))
    for f in range(3):
        v = sandwich_expectation(cell, msgs, 2, BIG, BIG, pauli.ALL["z"], flavor=f)
        assert abs(v - 1.0) < 1e-10


def test_sandwich_matches_dense_oracle():
    """Numerator/denominator ratio equals an independent dense contraction
    with the operator-sandwiched tensor at the same node."""
    N, D = 2, 2
    cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(0))
    msgs = C.initial_messages(N, D, chi=BIG, model="random", key=jax.random.PRNGKey(7))
    op = pauli.ALL["z"]

    flavor = 1
    engine = sandwich_expectation(cell, msgs, N, BIG, BIG, op, flavor=flavor)

    # oracle: dense contraction with/without the sandwiched tensor at the
    # same central node the engine picks
    graph = C._graph_for(N, D, BIG, tuple(int(s) for s in BlockSide))
    lat_nodes = [n for n in graph.nodes if n.source[0] == "lat"]
    mine = [n for n in lat_nodes if n.source[1] % 3 == flavor]
    cx = np.mean([n.pos for n in lat_nodes], axis=0)
    node = min(mine, key=lambda n: (n.pos[0] - cx[0]) ** 2 + (n.pos[1] - cx[1]) ** 2)
    target = node.source[1]

    fused = [np.asarray(t) for t in C.fused_cells(cell)]
    f_op = np.asarray(fused_tensor_with_operator(cell.B, op))
    msg_np = {int(s): [np.asarray(x) for x in m.sites] for s, m in msgs.items()}

    def fetch(src, with_op):
        if src[0] == "lat":
            if with_op and src[1] == target:
                return f_op
            return fused[src[1] % 3]
        _, side, k = src
        return msg_np[side][k]

    order = sweep_order(graph, BlockSide.U)
    num, ol1 = exact.contract_dense(graph, lambda s: fetch(s, True), order)
    den, ol2 = exact.contract_dense(graph, lambda s: fetch(s, False), order)
    assert not ol1 and not ol2
    oracle = complex(num) / complex(den)

    np.testing.assert_allclose(complex(engine), oracle, rtol=1e-9)


def test_measure_xyz_sandwich_shape():
    cell = UnitCell.zero_product_state(2, 2)
    msgs = C.initial_messages(2, 2, chi=16, model="uniform")
    out = measure_xyz_sandwich(cell, msgs, 2, 16, 16)
    assert set(out) == {"A", "B", "C"}
    for f in "ABC":
        assert set(out[f]) == {"x", "y", "z"}
        assert abs(out[f]["z"] - 1.0) < 1e-8


def test_classical_messages_are_valid_and_usable():
    """UC/RC messages: diagonal, trace-1 sites; BP accepts them."""
    m_uc = mpslib.classical_message(2, 3, None)
    m_rc = mpslib.classical_message(2, 3, jax.random.PRNGKey(0))
    for m in (m_uc, m_rc):
        for s in m.sites:
            mat = np.asarray(s).reshape(2, 2)
            np.testing.assert_allclose(mat, np.diag(np.diag(mat)), atol=1e-12)
            assert abs(np.trace(mat) - 1.0) < 1e-10

    msgs = C.initial_messages(2, 2, chi=16, model="random-classic",
                              key=jax.random.PRNGKey(1))
    # a BP-style contraction through them works and yields a finite scalar
    cell = UnitCell.random(D=2, d=2, key=jax.random.PRNGKey(2))
    plan = C.full_scalar_plan(2, 2, chi=BIG, chi_msg=BIG)
    mant, log = C.run_plan(plan, cell, msgs)
    val = complex(mant) * np.exp(float(log))
    assert np.isfinite(val.real) and np.isfinite(val.imag)
