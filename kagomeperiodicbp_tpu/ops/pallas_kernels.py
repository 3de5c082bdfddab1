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


def _compute_dtype(x: jnp.ndarray, interpret: bool, who: str):
    """Kernel compute precision for input `x`: float32 normally; float64 when
    the input is double precision AND we are in interpret mode (CPU). A
    float64 input on a real TPU kernel would silently lose precision — the
    repo's 1e-10 x64 numerics invariant — so that combination raises
    (ADVICE r3: the old code always computed in f32 planes)."""
    real_dtype = jnp.zeros((), x.dtype).real.dtype
    if real_dtype == jnp.dtype(jnp.float64):
        if not interpret:
            raise TypeError(
                f"{who}: float64/complex128 input requires interpret mode "
                "(CPU); the TPU kernel computes in float32 planes")
        return jnp.float64
    return jnp.float32


def _fused_kernel_real(tr_ref, ti_ref, or_ref, oi_ref, *, ct):
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
    rr = jnp.dot(m_r.T, m_r, preferred_element_type=ct)
    ii = jnp.dot(m_i.T, m_i, preferred_element_type=ct)
    ir = jnp.dot(m_i.T, m_r, preferred_element_type=ct)
    ri = jnp.dot(m_r.T, m_i, preferred_element_type=ct)
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
    ct = _compute_dtype(t, interpret, "fused_tensor_pallas")
    is_complex = jnp.issubdtype(t.dtype, jnp.complexfloating)
    tr = jnp.real(t).astype(ct)
    ti = (jnp.imag(t) if is_complex else jnp.zeros_like(tr)).astype(ct)

    out_shape = (
        jax.ShapeDtypeStruct((p, p, p, p), ct),
        jax.ShapeDtypeStruct((p, p, p, p), ct),
    )
    out_r, out_i = pl.pallas_call(
        partial(_fused_kernel_real, ct=ct),
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


def _chol_inv_kernel(gr_ref, gi_ref, lr_ref, li_ref, wr_ref, wi_ref, *, ct):
    """G = L·L† (complex Cholesky) and W = L⁻¹, both lower-triangular, in one
    VMEM pass. Complex via explicit re/im planes (no complex registers on
    TPU). The j-loops are sequential by nature (factorization data
    dependence); every step is full-width VPU work on the (n, n) tile, so
    the kernel stays vectorized — only the *step order* is serial.

    Padding contract: the caller pads G to tile size with an IDENTITY block
    (block-diagonal), so L and W are block-diagonal too and the top-left
    (k, k) slice is exactly the unpadded answer."""
    # NO dynamic_slice / dynamic_update_slice anywhere: those primitives have
    # no Pallas TPU lowering (observed on hardware: "Unimplemented primitive
    # in Pallas TPU lowering for KernelType.TC: dynamic_slice"). Every
    # row/column/diagonal access is a masked full-tile reduction and every
    # write a masked select — same O(n²)-per-step VPU work, lowerable.
    n = gr_ref.shape[0]
    gr, gi = gr_ref[:], gi_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    tiny = ct(1e-300 if ct == jnp.float64 else 1e-30)
    zeros = jnp.zeros((n, n), ct)

    def chol_step(j, carry):
        gr, gi, lr, li = carry
        at_col = cols == j                                   # [1, n] mask
        gjj = jnp.sum(jnp.where((rows == j) & at_col, gr, 0.0))
        dinv = jax.lax.rsqrt(jnp.maximum(gjj, tiny))
        cr = jnp.sum(jnp.where(at_col, gr, 0.0), axis=1, keepdims=True)
        ci = jnp.sum(jnp.where(at_col, gi, 0.0), axis=1, keepdims=True)
        keep = rows >= j
        cr = jnp.where(keep, cr * dinv, 0.0)                 # [n, 1]
        ci = jnp.where(keep, ci * dinv, 0.0)
        lr = jnp.where(at_col, cr, lr)                       # write column j
        li = jnp.where(at_col, ci, li)
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
        at_row = rows == j                                   # [n, 1] mask
        rr = jnp.sum(jnp.where(at_row, lr, 0.0), axis=0, keepdims=True)
        ri = jnp.sum(jnp.where(at_row, li, 0.0), axis=0, keepdims=True)
        keep = cols < j
        rr = jnp.where(keep, rr, 0.0)                        # [1, n]
        ri = jnp.where(keep, ri, 0.0)
        accr = (jnp.dot(rr, wr, preferred_element_type=ct)
                - jnp.dot(ri, wi, preferred_element_type=ct))
        acci = (jnp.dot(rr, wi, preferred_element_type=ct)
                + jnp.dot(ri, wr, preferred_element_type=ct))
        ej = jnp.where(cols == j, ct(1.0), ct(0.0))
        ljj = jnp.sum(jnp.where(at_row & (cols == j), lr, 0.0))
        inv = 1.0 / jnp.maximum(ljj, tiny)
        wr = jnp.where(at_row, (ej - accr) * inv, wr)        # write row j
        wi = jnp.where(at_row, (0.0 - acci) * inv, wi)
        return wr, wi

    wr, wi = jax.lax.fori_loop(0, n, inv_step, (zeros, zeros))
    wr_ref[:] = wr
    wi_ref[:] = wi


def chol_inv_pallas(g: jnp.ndarray, interpret: bool | None = None):
    """Fused chol(G) + W = L⁻¹ for a hermitian PSD G [k, k] (complex or
    real). Returns (L, W) in G's dtype, lower-triangular, G = L·L†.
    Compute precision matches G (f64 planes in interpret mode for
    f64/c128 inputs; on a real TPU those dtypes raise — the kernel is
    f32-planes there).

    The caller composes CholeskyQR from these with two MXU matmuls:
    G = A†A (before), Q = A·W† (after) — see ops/linalg.cholqr2."""
    k = g.shape[0]
    n = max(128, ((k + 127) // 128) * 128)
    is_complex = jnp.issubdtype(g.dtype, jnp.complexfloating)
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)

    ct = _compute_dtype(g, interpret, "chol_inv_pallas")
    gr = jnp.real(g).astype(ct)
    gi = (jnp.imag(g) if is_complex else jnp.zeros_like(gr)).astype(ct)
    # identity pad block keeps the factorization block-diagonal
    pad_eye = jnp.eye(n, dtype=ct)
    gr_p = pad_eye.at[:k, :k].set(gr)
    gi_p = jnp.zeros((n, n), ct).at[:k, :k].set(gi)

    out_shape = tuple(jax.ShapeDtypeStruct((n, n), ct) for _ in range(4))
    lr, li, wr, wi = pl.pallas_call(
        partial(_chol_inv_kernel, ct=ct),
        out_shape=out_shape,
        interpret=interpret,
    )(gr_p, gi_p)
    lr, li, wr, wi = lr[:k, :k], li[:k, :k], wr[:k, :k], wi[:k, :k]
    if is_complex:
        return (lr + 1j * li).astype(g.dtype), (wr + 1j * wi).astype(g.dtype)
    return lr.astype(g.dtype), wr.astype(g.dtype)
