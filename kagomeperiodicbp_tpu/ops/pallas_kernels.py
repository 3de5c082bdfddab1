"""Pallas TPU kernels for hot ops.

Round-1 kernels:

* ``fused_tensor_pallas`` — the ket⊗bra double-layer build
  T[d, D,D,D,D] → [D², D², D², D²] with interleaved ket-bra fusing.
  XLA lowers the einsum+transpose+reshape chain as separate passes; the
  kernel emits the fused layout in one VMEM-resident pass. Called for every
  unit-cell flavor per BP/edge program build.

Kernels are used when ``KPBP_USE_PALLAS=1`` (off by default until the
experimental axon backend stabilises; the interpret-mode path keeps them
correct and tested everywhere).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _use_pallas() -> bool:
    return os.environ.get("KPBP_USE_PALLAS", "0") == "1"


def _fused_kernel_real(tr_ref, ti_ref, or_ref, oi_ref):
    """Compute Σ_d T[d,a,b,c,e]·conj(T[d,A,B,C,E]) with output laid out as
    [(aA),(bB),(cC),(eE)] — complex via explicit re/im (TPU pallas has no
    complex dtype support)."""
    tr = tr_ref[:]  # [d, D,D,D,D] real part
    ti = ti_ref[:]
    d = tr.shape[0]
    D = tr.shape[1]
    # contract the physical leg: out[a,b,c,e,A,B,C,E]
    m_r = tr.reshape(d, D * D * D * D)
    m_i = ti.reshape(d, D * D * D * D)
    # T·T†: (r+ii)(r'-ii')ᵀ → real: r·r'ᵀ + i·i'ᵀ ; imag: i·r'ᵀ − r·i'ᵀ
    rr = jnp.dot(m_r.T, m_r, preferred_element_type=jnp.float32)
    ii = jnp.dot(m_i.T, m_i, preferred_element_type=jnp.float32)
    ir = jnp.dot(m_i.T, m_r, preferred_element_type=jnp.float32)
    ri = jnp.dot(m_r.T, m_i, preferred_element_type=jnp.float32)
    out_r = rr + ii
    out_i = ir - ri
    # reorder [abce, ABCE] → [(aA),(bB),(cC),(eE)]
    t8 = out_r.reshape(D, D, D, D, D, D, D, D)
    t8 = jnp.transpose(t8, (0, 4, 1, 5, 2, 6, 3, 7))
    or_ref[:] = t8.reshape(D * D, D * D, D * D, D * D)
    t8i = out_i.reshape(D, D, D, D, D, D, D, D)
    t8i = jnp.transpose(t8i, (0, 4, 1, 5, 2, 6, 3, 7))
    oi_ref[:] = t8i.reshape(D * D, D * D, D * D, D * D)


def fused_tensor_pallas(t: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """Pallas version of networks.unit_cell.fused_tensor.

    Complex input is split into real/imag planes (the axon backend cannot
    even transfer complex buffers; pallas TPU has no complex registers), the
    kernel computes both output planes in one VMEM pass, and the result is
    recombined.
    """
    D = t.shape[1]
    p = D * D
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    is_complex = jnp.issubdtype(t.dtype, jnp.complexfloating)
    tr = jnp.real(t).astype(jnp.float32)
    ti = (jnp.imag(t) if is_complex else jnp.zeros_like(tr)).astype(jnp.float32)

    out_shape = (
        jax.ShapeDtypeStruct((p, p, p, p), jnp.float32),
        jax.ShapeDtypeStruct((p, p, p, p), jnp.float32),
    )
    out_r, out_i = pl.pallas_call(
        _fused_kernel_real,
        out_shape=out_shape,
        interpret=interpret,
    )(tr, ti)
    if is_complex:
        return (out_r + 1j * out_i).astype(t.dtype)
    return out_r.astype(t.dtype)


def fused_tensor_dispatch(t: jnp.ndarray) -> jnp.ndarray:
    """fused_tensor via pallas when enabled, XLA otherwise."""
    if _use_pallas():
        return fused_tensor_pallas(t)
    from ..networks.unit_cell import fused_tensor

    return fused_tensor(t)
