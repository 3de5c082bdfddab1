"""Engine-vs-oracle validation: the planner+executor must reproduce exact
dense contractions to float64 precision when χ is large enough (the
"exact mode" acceptance criterion, SURVEY.md §4 / reference scripts/tests/bp.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagomeperiodicbp_tpu.lattices import BlockSide
from kagomeperiodicbp_tpu.networks.graph import full_graph
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.algo import contraction as C
from kagomeperiodicbp_tpu.ops import exact, mps as mpslib
from kagomeperiodicbp_tpu.planner.compiler import compile_plan, sweep_order

BIG = 10**6  # effectively-no-truncation χ


def _setup(N=2, D=2, seed=0, model="random"):
    cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(seed))
    msgs = C.initial_messages(N, D, chi=BIG, model=model, key=jax.random.PRNGKey(seed + 7))
    return cell, msgs


def _np_fetch(cell, msgs):
    fused = [np.asarray(t) for t in C.fused_cells(cell)]
    scale = 0.0
    for m in msgs.values():
        scale += float(m.logscale)

    def fetch(source):
        if source[0] == "lat":
            return fused[source[1] % 3]
        _, side, k = source
        return np.asarray(msgs[BlockSide(side)].sites[k])

    return fetch, scale


@pytest.mark.parametrize("toward", list(BlockSide))
def test_outgoing_message_matches_oracle(toward):
    N, D = 2, 2
    cell, msgs = _setup(N, D)
    plan = C.to_message_plan(N, D, chi=BIG, chi_msg=BIG, toward=int(toward))
    raw = C.run_plan(plan, cell, msgs)
    dense_engine = np.asarray(mpslib.dense(raw))

    # oracle: same graph, independent dense contraction in sweep order
    sides = tuple(int(s) for s in BlockSide if int(s) != int(toward))
    graph = C._graph_for(N, D, BIG, sides)
    fetch, mlog = _np_fetch(cell, {s: m for s, m in msgs.items() if int(s) != int(toward)})
    order = sweep_order(graph, toward)
    env, open_legs = exact.contract_dense(graph, fetch, order)
    env = env * np.exp(mlog)

    # align axes: oracle open_legs -> plan.final_sites order
    perm = [open_legs.index(site) for site in plan.final_sites]
    env = np.transpose(env, perm)
    assert env.shape == dense_engine.shape
    scale = np.max(np.abs(env))
    assert scale > 0
    np.testing.assert_allclose(dense_engine / scale, env / scale, atol=1e-10)


def test_full_scalar_matches_oracle():
    N, D = 2, 2
    cell, msgs = _setup(N, D)
    plan = C.full_scalar_plan(N, D, chi=BIG, chi_msg=BIG)
    mantissa, log = C.run_plan(plan, cell, msgs)
    value_engine = complex(mantissa) * np.exp(float(log))

    graph = C._graph_for(N, D, BIG, tuple(int(s) for s in BlockSide))
    fetch, mlog = _np_fetch(cell, msgs)
    order = sweep_order(graph, BlockSide.U)
    env, open_legs = exact.contract_dense(graph, fetch, order)
    assert not open_legs
    value_oracle = complex(env) * np.exp(mlog)

    np.testing.assert_allclose(value_engine, value_oracle, rtol=1e-9)


def test_truncated_close_to_exact():
    """Moderate χ must stay close to the exact value (sanity of compression)."""
    N, D = 2, 2
    cell, msgs = _setup(N, D)
    exact_plan = C.full_scalar_plan(N, D, chi=BIG, chi_msg=BIG)
    me, le = C.run_plan(exact_plan, cell, msgs)
    trunc_plan = C.full_scalar_plan(N, D, chi=8, chi_msg=BIG)
    mt, lt = C.run_plan(trunc_plan, cell, msgs)
    ve = complex(me) * np.exp(float(le))
    vt = complex(mt) * np.exp(float(lt))
    # random cell + random messages → heavy cancellation; χ=8 of ~64 exact
    # bond still reproduces the value to a few percent
    assert abs(vt - ve) / abs(ve) < 0.1


def test_mps_roundtrip_ops():
    """compress/canonicalize preserve the state; distance detects change."""
    key = jax.random.PRNGKey(3)
    sites = []
    dims = [1, 3, 5, 4, 1]
    p = 4
    for i in range(4):
        k1, k2, key = jax.random.split(key, 3)
        s = jax.random.normal(k1, (dims[i], p, dims[i + 1])) + 1j * jax.random.normal(
            k2, (dims[i], p, dims[i + 1])
        )
        sites.append(s)
    m = mpslib.from_sites(sites)
    m2 = mpslib.compress(m, chi=100)  # no truncation: same state
    np.testing.assert_allclose(
        np.asarray(mpslib.dense(m)), np.asarray(mpslib.dense(m2)), atol=1e-10
    )
    assert float(mpslib.distance(m, m2)) < 1e-12
    m3 = mpslib.compress(m, chi=2)  # truncation: different state
    assert float(mpslib.distance(m, m3)) > 1e-8
    # add: |m⟩+|m⟩ has distance 0 to |m⟩ (collinear)
    m4 = mpslib.add(m, m, 1.0, 1.0)
    assert float(mpslib.distance(m, m4)) < 1e-10
