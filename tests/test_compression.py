"""Large-D compression machinery: rsvd, SVD-free iterative compression
(reference reduceDiter, bmpslib.py:989), and two-tier lazy truncation
(reference D_trunc/D_trunc2, bubblecon.py:2995-3011)."""
import jax
import jax.numpy as jnp
import numpy as np

from kagomeperiodicbp_tpu.lattices import BlockSide
from kagomeperiodicbp_tpu.algo import contraction as C
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.ops import mps as mpslib
from kagomeperiodicbp_tpu.ops.linalg import rsvd_trunc, svd_trunc


def _random_mps(key, n=6, p=4, chi=16):
    sites = []
    dims = [1] + [chi] * (n - 1) + [1]
    for i in range(n):
        k1, k2, key = jax.random.split(key, 3)
        s = jax.random.normal(k1, (dims[i], p, dims[i + 1])) + 1j * jax.random.normal(
            k2, (dims[i], p, dims[i + 1])
        )
        sites.append(s)
    return mpslib.from_sites(sites)


def test_rsvd_low_rank_exact():
    """rsvd reconstructs a rank-k matrix to near machine precision."""
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (300, 24)) @ jax.random.normal(k2, (24, 400))
    u, s, vh = rsvd_trunc(a, 24)
    rec = u @ (s[:, None].astype(u.dtype) * vh)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(a), atol=1e-8)


def test_rsvd_close_to_svd_on_decaying_spectrum():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    u0, _ = jnp.linalg.qr(jax.random.normal(k1, (200, 200)))
    v0, _ = jnp.linalg.qr(jax.random.normal(k2, (200, 200)))
    sv = jnp.exp(-jnp.arange(200) / 8.0)
    a = (u0 * sv) @ v0.T
    k = 32
    _, s_r, _ = rsvd_trunc(a, k)
    _, s_e, _ = svd_trunc(a, k)
    np.testing.assert_allclose(np.asarray(s_r), np.asarray(s_e), rtol=1e-6)


def test_compress_iter_no_truncation_is_exact():
    m = _random_mps(jax.random.PRNGKey(2), n=5, p=3, chi=6)
    out = mpslib.compress_iter(m, chi=100)
    np.testing.assert_allclose(
        np.asarray(mpslib.dense(out)), np.asarray(mpslib.dense(m)), atol=1e-10
    )


def test_compress_iter_matches_svd_quality():
    """The variational QR compression reaches (approximately) the optimal
    truncation error that the SVD path achieves."""
    m = _random_mps(jax.random.PRNGKey(3), n=6, p=4, chi=16)
    chi = 8
    d_svd = float(mpslib.distance(m, mpslib.compress(m, chi)))
    d_iter = float(mpslib.distance(m, mpslib.compress_iter(m, chi, sweeps=4)))
    assert d_iter <= d_svd * 1.5 + 1e-12, (d_iter, d_svd)
    # and the output respects the bond cap
    out = mpslib.compress_iter(m, chi)
    assert max(out.bond_dims) <= chi


def test_compress_iter_jits():
    m = _random_mps(jax.random.PRNGKey(4), n=5, p=4, chi=12)
    f = jax.jit(lambda x: mpslib.compress_iter(x, 6))
    out = f(m)
    ref = mpslib.compress_iter(m, 6)
    np.testing.assert_allclose(
        np.asarray(mpslib.dense(out)), np.asarray(mpslib.dense(ref)), atol=1e-9
    )


def test_lazy_two_tier_truncation_close_to_eager():
    """chi_lazy mode must stay close to the per-swallow truncation result
    (both approximate the same exact message)."""
    import dataclasses

    N, D = 2, 2
    cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(5))
    msgs = C.initial_messages(N, D, chi=10**6, model="random",
                              key=jax.random.PRNGKey(11))
    exact_plan = C.full_scalar_plan(N, D, chi=10**6, chi_msg=10**6)
    me, le = C.run_plan(exact_plan, cell, msgs)
    ve = complex(me) * np.exp(float(le))

    eager = C.full_scalar_plan(N, D, chi=8, chi_msg=10**6)
    m1, l1 = C.run_plan(eager, cell, msgs)
    v1 = complex(m1) * np.exp(float(l1))

    lazy = dataclasses.replace(eager, chi_lazy=16)
    m2, l2 = C.run_plan(lazy, cell, msgs)
    v2 = complex(m2) * np.exp(float(l2))

    # the lazy variant sees *less* truncation pressure → at least as accurate
    assert abs(v2 - ve) / abs(ve) < 0.1
    assert abs(v1 - ve) / abs(ve) < 0.1
