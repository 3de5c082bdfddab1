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
