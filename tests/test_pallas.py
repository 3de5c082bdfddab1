"""Pallas kernel correctness (interpret mode on CPU)."""
import jax
import numpy as np
import pytest

from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell, fused_tensor
from kagomeperiodicbp_tpu.ops.pallas_kernels import fused_tensor_pallas


@pytest.mark.parametrize("D", [2, 3])
def test_fused_tensor_pallas_matches_xla(D):
    import jax.numpy as jnp

    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(0), dtype=jnp.complex64)
    ref = np.asarray(fused_tensor(cell.A))
    got = np.asarray(fused_tensor_pallas(cell.A, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_fused_tensor_pallas_real():
    import jax.numpy as jnp

    cell = UnitCell.random(d=2, D=2, key=jax.random.PRNGKey(1), dtype=jnp.float32)
    ref = np.asarray(fused_tensor(cell.A))
    got = np.asarray(fused_tensor_pallas(cell.A, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-6)


@pytest.mark.parametrize("k", [6, 18, 37, 130])
def test_chol_inv_pallas_matches_lapack(k):
    """Fused chol+inv kernel vs jnp.linalg.cholesky / explicit inverse."""
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.ops.pallas_kernels import chol_inv_pallas

    kb = jax.random.PRNGKey(k)
    b = jax.random.normal(kb, (k, k)) + 1j * jax.random.normal(jax.random.fold_in(kb, 1), (k, k))
    g = (b @ b.conj().T + k * jnp.eye(k)).astype(jnp.complex64)  # well-conditioned PSD

    l, w = chol_inv_pallas(g, interpret=True)
    l_ref = np.linalg.cholesky(np.asarray(g, dtype=np.complex128))
    # f32 rounding accumulates like sqrt(k), not k (ADVICE r3: the old
    # linear-in-k atol was 0.065 at k=130 — loose enough to hide real bugs);
    # also bound the relative error against |L|'s scale.
    scale = float(np.abs(l_ref).max())
    np.testing.assert_allclose(np.asarray(l), l_ref,
                               atol=5e-4 * np.sqrt(k), rtol=2e-4 * scale)
    # W really is L^-1
    np.testing.assert_allclose(np.asarray(w) @ l_ref, np.eye(k), atol=5e-4)


def test_chol_inv_pallas_f64_interpret():
    """f64/c128 inputs keep double precision in interpret mode (ADVICE r3:
    the kernel used to silently downcast to f32 planes)."""
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.ops.pallas_kernels import chol_inv_pallas

    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64")
    k = 24
    kb = jax.random.PRNGKey(7)
    b = (jax.random.normal(kb, (k, k)) +
         1j * jax.random.normal(jax.random.fold_in(kb, 1), (k, k)))
    g = (b @ b.conj().T + k * jnp.eye(k)).astype(jnp.complex128)
    l, w = chol_inv_pallas(g, interpret=True)
    assert np.asarray(l).dtype == np.complex128
    l_ref = np.linalg.cholesky(np.asarray(g))
    np.testing.assert_allclose(np.asarray(l), l_ref, atol=1e-11)
    np.testing.assert_allclose(np.asarray(w) @ l_ref, np.eye(k), atol=1e-11)


def test_chol_inv_pallas_real_dtype():
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.ops.pallas_kernels import chol_inv_pallas

    b = jax.random.normal(jax.random.PRNGKey(3), (12, 12), jnp.float32)
    g = b @ b.T + 12 * jnp.eye(12)
    l, w = chol_inv_pallas(g, interpret=True)
    np.testing.assert_allclose(np.asarray(w) @ np.asarray(l), np.eye(12), atol=1e-4)
    np.testing.assert_allclose(np.asarray(l) @ np.asarray(l).T, np.asarray(g), rtol=2e-4, atol=2e-3)


def test_cholqr2_pallas_path(monkeypatch):
    """cholqr2 routed through the pallas kernel: Q orthonormal, QR = A,
    R upper-triangular with nonneg diagonal (same contract as LAPACK path)."""
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.ops import linalg

    monkeypatch.setenv("KPBP_USE_PALLAS", "1")
    a = (jax.random.normal(jax.random.PRNGKey(5), (90, 24))
         + 1j * jax.random.normal(jax.random.PRNGKey(6), (90, 24))).astype(jnp.complex64)
    q, r = linalg.cholqr2(a)
    qn, rn = np.asarray(q), np.asarray(r)
    np.testing.assert_allclose(qn.conj().T @ qn, np.eye(24), atol=2e-5)
    np.testing.assert_allclose(qn @ rn, np.asarray(a), atol=2e-4)
    assert np.allclose(rn, np.triu(rn), atol=2e-5)
    assert np.all(np.real(np.diag(rn)) > -1e-6)
