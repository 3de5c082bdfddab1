"""Pallas TPU kernels for hot ops.

Round-1 kernels:

* ``fused_tensor_pallas`` — the ket⊗bra double-layer build
  T[d, D,D,D,D] → [D², D², D², D²] with interleaved ket-bra fusing.
  XLA lowers the einsum+transpose+reshape chain as separate passes; the
  kernel emits the fused layout in one VMEM-resident pass. Called for every
  unit-cell flavor per BP/edge program build.

Round-3 kernels:

* ``chol_inv_pallas`` — the small-matrix half of CholeskyQR2
  (ops/linalg.cholqr2, the MXU-friendly replacement for the Householder QR
  that dominates BP sweeps — profiled at 45%/79%/90% of a contraction at
  D=3/4/5, BENCHMARKS.md). The gram matmul and Q = A·W† stay outside on
  the MXU; the kernel fuses chol(G) + triangular inversion W = L⁻¹ into
  ONE VMEM-resident pass, removing the HBM bounces and two loop-heavy HLO
  custom calls XLA emits for tiny (χ×χ, χ ≤ ~150) factorizations.

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


def _chol_inv_kernel(gr_ref, gi_ref, lr_ref, li_ref, wr_ref, wi_ref):
    """G = L·L† (complex Cholesky) and W = L⁻¹, both lower-triangular, in one
    VMEM pass. Complex via explicit re/im planes (no complex registers on
    TPU). The j-loops are sequential by nature (factorization data
    dependence); every step is full-width VPU work on the (n, n) tile, so
    the kernel stays vectorized — only the *step order* is serial.

    Padding contract: the caller pads G to tile size with an IDENTITY block
    (block-diagonal), so L and W are block-diagonal too and the top-left
    (k, k) slice is exactly the unpadded answer."""
    n = gr_ref.shape[0]
    gr, gi = gr_ref[:], gi_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    tiny = jnp.float32(1e-30)
    zeros = jnp.zeros((n, n), jnp.float32)

    def chol_step(j, carry):
        gr, gi, lr, li = carry
        gjj = jax.lax.dynamic_slice(gr, (j, j), (1, 1))[0, 0]
        dinv = jax.lax.rsqrt(jnp.maximum(gjj, tiny))
        cr = jax.lax.dynamic_slice(gr, (0, j), (n, 1))
        ci = jax.lax.dynamic_slice(gi, (0, j), (n, 1))
        keep = rows >= j
        cr = jnp.where(keep, cr * dinv, 0.0)
        ci = jnp.where(keep, ci * dinv, 0.0)
        lr = jax.lax.dynamic_update_slice(lr, cr, (0, j))
        li = jax.lax.dynamic_update_slice(li, ci, (0, j))
        # trailing update G -= c·c† (rank-1, broadcast outer product on VPU);
        # rows/cols ≤ j become garbage but are never read again
        crT = jnp.transpose(cr)
        ciT = jnp.transpose(ci)
        gr = gr - (cr * crT + ci * ciT)
        gi = gi - (ci * crT - cr * ciT)
        return gr, gi, lr, li

    gr, gi, lr, li = jax.lax.fori_loop(0, n, chol_step, (gr, gi, zeros, zeros))
    lr_ref[:] = lr
    li_ref[:] = li

    def inv_step(j, carry):
        # forward substitution, one row per step:
        # W[j, :] = (e_j − L[j, :j] · W[:j, :]) / L[j, j]
        wr, wi = carry
        rr = jax.lax.dynamic_slice(lr, (j, 0), (1, n))
        ri = jax.lax.dynamic_slice(li, (j, 0), (1, n))
        keep = cols < j
        rr = jnp.where(keep, rr, 0.0)
        ri = jnp.where(keep, ri, 0.0)
        accr = (jnp.dot(rr, wr, preferred_element_type=jnp.float32)
                - jnp.dot(ri, wi, preferred_element_type=jnp.float32))
        acci = (jnp.dot(rr, wi, preferred_element_type=jnp.float32)
                + jnp.dot(ri, wr, preferred_element_type=jnp.float32))
        ej = jnp.where(cols == j, jnp.float32(1.0), jnp.float32(0.0))
        ljj = jax.lax.dynamic_slice(lr, (j, j), (1, 1))[0, 0]
        inv = 1.0 / jnp.maximum(ljj, tiny)
        wr = jax.lax.dynamic_update_slice(wr, (ej - accr) * inv, (j, 0))
        wi = jax.lax.dynamic_update_slice(wi, (0.0 - acci) * inv, (j, 0))
        return wr, wi

    wr, wi = jax.lax.fori_loop(0, n, inv_step, (zeros, zeros))
    wr_ref[:] = wr
    wi_ref[:] = wi


def chol_inv_pallas(g: jnp.ndarray, interpret: bool | None = None):
    """Fused chol(G) + W = L⁻¹ for a hermitian PSD G [k, k] (complex or
    real). Returns (L, W) in G's dtype, lower-triangular, G = L·L†.

    The caller composes CholeskyQR from these with two MXU matmuls:
    G = A†A (before), Q = A·W† (after) — see ops/linalg.cholqr2."""
    k = g.shape[0]
    n = max(128, ((k + 127) // 128) * 128)
    is_complex = jnp.issubdtype(g.dtype, jnp.complexfloating)
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)

    gr = jnp.real(g).astype(jnp.float32)
    gi = (jnp.imag(g) if is_complex else jnp.zeros_like(gr)).astype(jnp.float32)
    # identity pad block keeps the factorization block-diagonal
    pad_eye = jnp.eye(n, dtype=jnp.float32)
    gr_p = pad_eye.at[:k, :k].set(gr)
    gi_p = jnp.zeros((n, n), jnp.float32).at[:k, :k].set(gi)

    out_shape = tuple(jax.ShapeDtypeStruct((n, n), jnp.float32) for _ in range(4))
    lr, li, wr, wi = pl.pallas_call(
        _chol_inv_kernel,
        out_shape=out_shape,
        interpret=interpret,
    )(gr_p, gi_p)
    lr, li, wr, wi = lr[:k, :k], li[:k, :k], wr[:k, :k], wi[:k, :k]
    if is_complex:
        return (lr + 1j * li).astype(g.dtype), (wr + 1j * wi).astype(g.dtype)
    return lr.astype(g.dtype), wr.astype(g.dtype)
