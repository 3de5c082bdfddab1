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


def _dense_from_sites(sites, logscale):
    """Contract an MPS site chain to the dense tensor [Dl, p1.., Dr]·e^ls."""
    out = sites[0]
    for s in sites[1:]:
        out = jnp.tensordot(out, s, axes=([out.ndim - 1], [0]))
    return out * jnp.exp(logscale).astype(out.dtype)


def test_gram_split_swallow_exact():
    """_swallow_ket_gram_split must reproduce the materialized-blob swallow
    exactly (f64, k = full row rank): same dense tensor after contracting the
    emitted sites back together. This is the memory-lean path that replaces
    the a·b·d²·D^(2·n_out) blob (200 GB at D=8) with ≤ a·b·d²·D⁴ pieces."""
    from kagomeperiodicbp_tpu.ops import contract as K

    rng = np.random.default_rng(0)
    D, d = 3, 2
    for n_out, a, b in [(2, 5, 4), (3, 4, 5)]:
        tk = jnp.asarray(rng.normal(size=(D,) + (D,) * n_out + (d,))
                         + 1j * rng.normal(size=(D,) + (D,) * n_out + (d,)))
        site = jnp.asarray(rng.normal(size=(a, D * D, b))
                           + 1j * rng.normal(size=(a, D * D, b)))

        # reference: materialized blob, exact QR split
        fr1 = K.Frontier(chi=BIG)
        fr1._init_scale(tk.dtype)
        blob = K._swallow_ket_blob(tk, [site], 1, n_out, D)
        blob = fr1._absorb_norm(blob)
        sites1 = K._split_blob(blob, fr1)
        dense1 = _dense_from_sites(sites1, fr1.logscale)

        # gram path with k = rows (chi huge → no truncation)
        fr2 = K.Frontier(chi=BIG)
        fr2._init_scale(tk.dtype)
        sites2 = K._swallow_ket_gram_split(tk, [site], n_out, D, BIG, fr2)
        dense2 = _dense_from_sites(sites2, fr2.logscale)

        np.testing.assert_allclose(
            np.asarray(dense2), np.asarray(dense1), atol=1e-10 * float(jnp.abs(dense1).max())
        )


def test_gram_split_message_quality_under_truncation(monkeypatch):
    """With KPBP_BLOB_LIMIT=1 every eligible swallow takes the gram path;
    the resulting truncated message must approximate the exact message about
    as well as the ordinary truncated path does."""
    monkeypatch.setenv("KPBP_BLOB_LIMIT", "1")
    N, D = 2, 3
    chi = 12
    cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(1))
    msgs = C.initial_messages(N, D, chi=chi, model="random", key=jax.random.PRNGKey(3))
    toward = BlockSide.U
    m_gram = C.outgoing_message_single(cell, msgs, N, D, chi, chi, toward)
    monkeypatch.delenv("KPBP_BLOB_LIMIT")
    m_norm = C.outgoing_message_single(cell, msgs, N, D, chi, chi, toward)
    # effectively-exact reference: χ=100 ≥ any rank this N=2/D=3 frontier
    # reaches (double-layer path; BIG would grow bonds as 9^rows)
    m_exact = C.outgoing_message(cell, msgs, N, D, 100, chi, toward)
    d_gram = float(mpslib.distance(m_gram, m_exact))
    d_norm = float(mpslib.distance(m_norm, m_exact))
    # measured bound: at this shape the retained-rank curve puts the default
    # s=2χ+32 at 1.12× the ordinary path's distance (data/sketch_rank_curve.json,
    # tools/sketch_rank_curve.py); 1.4 leaves seed/direction margin.
    assert d_gram < max(1.4 * d_norm, d_norm + 1e-9)


def test_env_overrides_program_granularity(monkeypatch):
    """KPBP_SINGLE_LAYER / KPBP_BP_BATCHED steer auto mode choices only:
    the fixed point must match the default path, and explicit config wins."""
    N, D = 2, 2
    cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(4))
    base = BPConfig(trunc_dim=8, max_iterations=40)
    msgs_ref, st_ref = belief_propagation(cell, None, base, N)
    assert st_ref.success

    monkeypatch.setenv("KPBP_SINGLE_LAYER", "1")
    msgs_env, st_env = belief_propagation(cell, None, base, N)
    assert st_env.success
    for side in BlockSide:
        assert float(mpslib.distance(msgs_ref[side], msgs_env[side])) < 1e-7

    monkeypatch.delenv("KPBP_SINGLE_LAYER")
    monkeypatch.setenv("KPBP_BP_BATCHED", "0")
    msgs_ps, st_ps = belief_propagation(cell, None, base, N)
    assert st_ps.success
    for side in BlockSide:
        assert float(mpslib.distance(msgs_ref[side], msgs_ps[side])) < 1e-7

    # explicit config is never overridden by the env
    monkeypatch.setenv("KPBP_SINGLE_LAYER", "1")
    explicit = BPConfig(trunc_dim=8, max_iterations=40, single_layer=False)
    msgs_ex, st_ex = belief_propagation(cell, None, explicit, N)
    assert st_ex.success
    for side in BlockSide:
        assert float(mpslib.distance(msgs_ref[side], msgs_ex[side])) < 1e-7
