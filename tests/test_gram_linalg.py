"""Gram-based (MXU-friendly) factorizations: CholeskyQR2 and eigh-of-gram
truncated SVD (KPBP_LINALG=gram).  These replace the sequential
Householder/Jacobi lowerings on TPU, where the profile shows QR is 45-80%
of a BP contraction (tools/profile_bp_phases.py) — so their correctness is
what makes that speedup admissible.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagomeperiodicbp_tpu.ops.linalg import (
    cholqr2,
    qr_stable,
    svd_trunc,
    svd_trunc_gram,
)


def _rand(m, n, seed=0, dtype=jnp.complex128):
    kr, ki = jax.random.split(jax.random.PRNGKey(seed))
    a = jax.random.normal(kr, (m, n))
    if jnp.issubdtype(dtype, jnp.complexfloating):
        a = a + 1j * jax.random.normal(ki, (m, n))
    return a.astype(dtype)


@pytest.mark.parametrize("m,n", [(24, 8), (64, 64), (100, 17)])
def test_cholqr2_orthonormal_and_reconstructs(m, n):
    a = _rand(m, n)
    q, r = cholqr2(a)
    assert q.shape == (m, n) and r.shape == (n, n)
    assert float(jnp.max(jnp.abs(q.conj().T @ q - jnp.eye(n)))) < 1e-12
    assert float(jnp.max(jnp.abs(q @ r - a))) < 1e-11 * float(jnp.max(jnp.abs(a)))
    # R upper-triangular with real non-negative diagonal (the unique gauge)
    assert float(jnp.max(jnp.abs(jnp.tril(r, -1)))) < 1e-11
    d = jnp.diagonal(r)
    assert float(jnp.max(jnp.abs(jnp.imag(d)))) < 1e-11
    assert float(jnp.min(jnp.real(d))) > -1e-11


def test_cholqr2_matches_householder_gauge():
    """With the phase gauge fixed on both, CholeskyQR2 and Householder QR
    agree on Q and R directly (full-rank case)."""
    a = _rand(40, 12, seed=3)
    q1, r1 = cholqr2(a)
    q2, r2 = qr_stable(a)
    assert float(jnp.max(jnp.abs(q1 - q2))) < 1e-10
    assert float(jnp.max(jnp.abs(r1 - r2))) < 1e-10


def test_cholqr2_rank_deficient_padded_bonds():
    """Zero columns (zero-padded bonds, UnitCell.pad_to) must not produce
    NaNs, and the factorization must still reconstruct A."""
    a = _rand(30, 10, seed=1)
    a = a.at[:, 4].set(0).at[:, 9].set(0)
    q, r = cholqr2(a)
    assert bool(jnp.all(jnp.isfinite(q))) and bool(jnp.all(jnp.isfinite(r)))
    assert float(jnp.max(jnp.abs(q @ r - a))) < 1e-10
    # live directions stay orthonormal
    live = [c for c in range(10) if c not in (4, 9)]
    qq = q[:, live]
    assert float(jnp.max(jnp.abs(qq.conj().T @ qq - jnp.eye(8)))) < 1e-10


@pytest.mark.parametrize("m,n,k", [(40, 24, 8), (24, 40, 8), (32, 32, 32)])
def test_svd_trunc_gram_matches_exact(m, n, k):
    a = _rand(m, n, seed=2)
    u1, s1, vh1 = svd_trunc(a, k)
    u2, s2, vh2 = svd_trunc_gram(a, k)
    assert float(jnp.max(jnp.abs(s1 - s2))) < 1e-9 * float(s1[0])
    # compare the truncated reconstructions (singular vectors are only
    # defined up to phase/degenerate rotation)
    b1 = (u1 * s1.astype(a.dtype)[None, :]) @ vh1
    b2 = (u2 * s2.astype(a.dtype)[None, :]) @ vh2
    assert float(jnp.max(jnp.abs(b1 - b2))) < 1e-9 * float(s1[0])


def test_gram_mode_bp_message_equivalent(monkeypatch):
    """A full outgoing-message contraction under KPBP_LINALG=gram matches the
    default path to oracle precision (gauge-invariant overlap)."""
    import math

    from kagomeperiodicbp_tpu.algo import contraction as C
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.ops import mps as mpslib
    from kagomeperiodicbp_tpu.ops.contract import execute_plan

    N, D, CHI = 2, 3, 12  # CHI below 2D² forces real truncation work
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(5), dtype=jnp.complex128)
    msgs = C.initial_messages(N, D, CHI, model="random", dtype=jnp.complex128)
    msg_sites = {int(s): tuple(m.sites) for s, m in msgs.items()}
    fused = C.fused_cells(cell)
    plan = C.to_message_plan(N, D, CHI, CHI, 0)
    fetch = C._make_fetch(fused, msg_sites)

    monkeypatch.delenv("KPBP_LINALG", raising=False)
    a = execute_plan(plan, fetch)
    monkeypatch.setenv("KPBP_LINALG", "gram")
    b = execute_plan(plan, fetch)

    ab, lab = mpslib.inner(a, b)
    aa, laa = mpslib.inner(a, a)
    bb, lbb = mpslib.inner(b, b)
    r = (abs(complex(ab)) / math.sqrt(abs(complex(aa)) * abs(complex(bb)))
         * math.exp(float(lab) - 0.5 * (float(laa) + float(lbb))))
    assert abs(1.0 - r) < 1e-9
    assert abs(float(a.logscale) - float(b.logscale)) < 1e-9
