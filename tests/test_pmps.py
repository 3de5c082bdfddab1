"""Purification-MPS (bubbleket) mode vs a dense oracle.

⟨PMPS|PMPS⟩ with purifiers traced must equal the exact double-layer
contraction Σ|Ψ|² of the ket network the PMPS represents.
(reference: bubblecon.py:1255 swallow_bubbleket_T / bubbleket=True mode)
"""
import jax
import jax.numpy as jnp
import numpy as np

from kagomeperiodicbp_tpu.ops.pmps import (
    PMPS,
    pmps_inner,
    pmps_root,
    ptrim,
    swallow_bubbleket,
)

DT = jnp.complex128


def _rand(shape, seed):
    kr, ki = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)).astype(DT)


def _inner_value(p):
    val, log = pmps_inner(p)
    return complex(val) * float(jnp.exp(log))


def test_chain_matches_dense():
    d, a_dim, b_dim = 2, 3, 4
    t1 = _rand((d, a_dim), 0)
    t2 = _rand((d, a_dim, b_dim), 1)
    t3 = _rand((d, b_dim), 2)
    psi = jnp.einsum("ia,jab,kb->ijk", t1, t2, t3)
    norm2 = float(jnp.sum(jnp.abs(psi) ** 2))

    p = pmps_root(t1, out_legs=[0])
    assert p.purifiers == (d,)
    p = swallow_bubbleket(p, t2, 0, in_legs=[0], out_legs=[1])
    p = swallow_bubbleket(p, t3, 0, in_legs=[0], out_legs=[])
    got = _inner_value(p)
    assert abs(got.imag) < 1e-9 * norm2
    assert abs(got.real - norm2) < 1e-9 * norm2


def test_two_leg_root_and_multi_in_swallow():
    """A 2×2 ket grid: root with two out legs, a two-in-leg swallow, and the
    final zero-out closure — every branch of the swallow."""
    d = 2
    a_dim, b_dim, c_dim, e_dim = 2, 3, 2, 3
    # Ψ = Σ t1[i,a,b] t2[j,a,c] t3[k,b,e] t4[l,c,e]
    t1 = _rand((d, a_dim, b_dim), 3)
    t2 = _rand((d, a_dim, c_dim), 4)
    t3 = _rand((d, b_dim, e_dim), 5)
    t4 = _rand((d, c_dim, e_dim), 6)
    psi = jnp.einsum("iab,jac,kbe,lce->ijkl", t1, t2, t3, t4)
    norm2 = float(jnp.sum(jnp.abs(psi) ** 2))

    p = pmps_root(t1, out_legs=[0, 1])             # sites: [a], [b]
    p = swallow_bubbleket(p, t2, 0, in_legs=[0], out_legs=[1])   # a → c: [c], [b]
    p = swallow_bubbleket(p, t3, 1, in_legs=[0], out_legs=[1])   # b → e: [c], [e]
    p = swallow_bubbleket(p, t4, 0, in_legs=[0, 1], out_legs=[])  # (c, e) → ∅
    got = _inner_value(p)
    assert abs(got.real - norm2) < 1e-9 * norm2


def test_ptrim_exact_at_full_rank_and_bounded_below():
    d, a_dim, b_dim = 2, 3, 3
    t1 = _rand((d, a_dim), 7)
    t2 = _rand((d, a_dim, b_dim), 8)
    p = pmps_root(t1, out_legs=[0])
    p = swallow_bubbleket(p, t2, 0, in_legs=[0], out_legs=[1])
    i = 0
    big = p.purifiers[i]
    assert big == d * d
    before = _inner_value(p)
    s = p.sites[i]
    full_rank = s.shape[0] * (s.shape[1] // big) * s.shape[2]
    if full_rank < big:
        exact = ptrim(p, i, full_rank)
        assert abs(_inner_value(exact) - before) < 1e-9 * abs(before)
        assert exact.purifiers[i] == full_rank
    # aggressive trim stays finite and positive
    rough = ptrim(p, i, 1)
    got = _inner_value(rough)
    assert np.isfinite(got.real) and got.real > 0


def test_swallow_with_bond_truncation():
    """chi-capped swallow: bonds stay ≤ chi and the value degrades
    gracefully (here ranks are small enough that chi=4 is exact)."""
    d = 2
    t1 = _rand((d, 2, 2), 9)
    t2 = _rand((d, 2, 2), 10)
    t3 = _rand((d, 2, 2), 11)
    t4 = _rand((d, 2, 2), 12)
    psi = jnp.einsum("iab,jac,kbe,lce->ijkl", t1, t2, t3, t4)
    norm2 = float(jnp.sum(jnp.abs(psi) ** 2))
    p = pmps_root(t1, out_legs=[0, 1])
    p = swallow_bubbleket(p, t2, 0, in_legs=[0], out_legs=[1], chi=4)
    p = swallow_bubbleket(p, t3, 1, in_legs=[0], out_legs=[1], chi=4)
    p = swallow_bubbleket(p, t4, 0, in_legs=[0, 1], out_legs=[], chi=4)
    for s in p.sites:
        assert s.shape[0] <= 4 and s.shape[2] <= 4
    got = _inner_value(p)
    assert abs(got.real - norm2) < 1e-8 * norm2
