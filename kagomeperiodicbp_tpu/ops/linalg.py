"""Small linear-algebra helpers shared by the MPS kernels and ITE.

All are jit-safe (static shapes) and work for real and complex dtypes on
both CPU (x64) and TPU (f32/c64 — verified op-by-op on the chip).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

PINV_RTOL = 1e-10  # reference PINV_THRESH (libs/ITE.py:97-ish constants)
# (legacy Tikhonov-fallback factor removed with the spectral robust_solve)


def rtol_for(dtype) -> float:
    """Regularisation threshold scaled to the working precision: the
    reference's 1e-10 assumes float64; below float32 epsilon it would be a
    no-op, so widen it there."""
    import jax.numpy as jnp

    if jnp.finfo(jnp.zeros((), dtype).real.dtype).bits <= 32:
        return 1e-6
    return PINV_RTOL


def _gram_mode() -> bool:
    """KPBP_LINALG=gram selects the MXU-friendly gram-based factorizations
    (CholeskyQR2 / eigh-of-gram SVD) — matmul-dominated, so they ride the
    TPU's systolic array instead of the sequential Householder/Jacobi
    lowerings. Read at TRACE time; set it before programs are built."""
    import os

    return os.environ.get("KPBP_LINALG") == "gram"


def _phase_fix(q, r):
    """Make R's diagonal real-nonnegative (unique gauge — keeps canonical
    forms deterministic across backends, stabilising BP message distances)."""
    d = jnp.diagonal(r, axis1=-2, axis2=-1)
    phase = jnp.where(jnp.abs(d) > 0, d / jnp.where(jnp.abs(d) > 0, jnp.abs(d), 1.0), 1.0)
    q = q * phase[..., None, :]
    r = r * jnp.conj(phase)[..., :, None]
    return q, r


def _cholqr_once(a: jnp.ndarray):
    """One shifted CholeskyQR pass for a tall [m, k] matrix (m ≥ k):
    G = A†A (one MXU matmul), R = chol(G), Q = A R⁻¹ (triangular solve).
    The shift ~u·tr(G) keeps the Cholesky alive for rank-deficient A (e.g.
    zero-padded bonds from UnitCell.pad_to); null directions come back with
    ~zero-norm Q columns, which carry no weight downstream."""
    from jax.scipy.linalg import solve_triangular

    k = a.shape[-1]
    g = a.conj().T @ a
    u = jnp.finfo(a.real.dtype).eps
    shift = u * jnp.maximum(jnp.trace(g).real, 1e-300)
    g = g + shift * jnp.eye(k, dtype=g.dtype)
    if os.environ.get("KPBP_USE_PALLAS", "0") == "1":
        # fused chol+inversion kernel (one VMEM pass); Q = A·W† is one MXU
        # matmul — replaces XLA's two loop-heavy HLO custom calls
        from .pallas_kernels import chol_inv_pallas

        l, w = chol_inv_pallas(g)
        return a @ w.conj().T, l.conj().T
    l = jnp.linalg.cholesky(g)                     # G = L L†
    # Q = A·(L†)⁻¹  ⇔  Q† = L⁻¹ A†
    qh = solve_triangular(l, a.conj().T, lower=True)
    return qh.conj().T, l.conj().T                 # (Q, R) with R = L† upper


def cholqr2(a: jnp.ndarray):
    """CholeskyQR2 (Yamamoto et al.): two passes restore orthonormality to
    ~machine eps for cond(A) ≲ u^(-1/2). Cost: 2 gram matmuls + 2 small
    Cholesky factorizations + 2 triangular solves — all MXU/VPU work, no
    sequential Householder loop. Requires m ≥ k (the executor's tall side)."""
    q1, r1 = _cholqr_once(a)
    q, r2 = _cholqr_once(q1)
    return _phase_fix(q, r2 @ r1)


def qr_stable(a: jnp.ndarray):
    """Thin QR with R's diagonal made real-nonnegative (unique gauge).

    KPBP_LINALG=gram routes tall matrices through CholeskyQR2 (see
    `_gram_mode`); wide matrices (m < k) stay on Householder — they are the
    cheap side and CholeskyQR needs the gram on the short axis anyway.
    """
    if _gram_mode() and a.ndim == 2 and a.shape[0] >= a.shape[1]:
        return cholqr2(a)
    q, r = jnp.linalg.qr(a, mode="reduced")
    return _phase_fix(q, r)


def svd_trunc(a: jnp.ndarray, k: int):
    """SVD keeping the k largest singular values. k must be static.

    Returns (u [m,k], s [k], vh [k,n]).
    """
    u, s, vh = jnp.linalg.svd(a, full_matrices=False)
    return u[..., :, :k], s[..., :k], vh[..., :k, :]


# Exact SVD up to this size; above it the randomized projection is both much
# faster and much lighter in memory. Plays the role of the reference's
# D-threshold compression switch (containers/contractions.py:28-34 selects
# 'iter' over 'SVD' for D>10, i.e. matrices ~χ=2D²>200).
RSVD_MIN_DIM = 256
RSVD_OVERSAMPLE = 10
RSVD_POWER_ITERS = 2


def rsvd_trunc(a: jnp.ndarray, k: int, oversample: int = RSVD_OVERSAMPLE,
               power_iters: int = RSVD_POWER_ITERS):
    """Randomized truncated SVD (Halko-Martinsson-Tropp): range-find with a
    Gaussian sketch + power iterations, then an exact SVD of the small
    projected matrix. (reference: quimb rsvd via bmpslib.py:188)

    MXU-friendly: the cost is 2(1+power_iters) matmuls against a [n, k+o]
    sketch plus a [k+o, n] SVD, vs a full [m, n] SVD. Deterministic: the
    sketch key is fixed (folded with the shape), so results are reproducible
    run-to-run.
    """
    m, n = a.shape
    ell = min(k + oversample, m, n)
    # fold value must fit uint32 (m·1000003+n overflows for m ≳ 4300)
    key = jax.random.fold_in(jax.random.PRNGKey(7), (m * 1000003 + n) % (2**31 - 1))
    omega = jax.random.normal(key, (n, ell), dtype=a.real.dtype)
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        omega = omega.astype(a.dtype)
    y = a @ omega                                  # [m, ell]
    q, _ = jnp.linalg.qr(y, mode="reduced")
    for _ in range(power_iters):
        z = a.conj().T @ q                         # [n, ell]
        z, _ = jnp.linalg.qr(z, mode="reduced")
        y = a @ z
        q, _ = jnp.linalg.qr(y, mode="reduced")
    b = q.conj().T @ a                             # [ell, n]
    ub, s, vh = jnp.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u[:, :k], s[:k], vh[:k, :]


def svd_trunc_gram(a: jnp.ndarray, k: int):
    """Truncated SVD via eigh of the gram matrix on the SHORT side: one MXU
    matmul + a hermitian eigendecomposition (far faster than Jacobi SVD on
    TPU) + one matmul to recover the other factor.  Squares the condition
    number, so singular values below √u·s_max lose accuracy — irrelevant for
    χ-truncation, where those directions are the ones being dropped.
    Returns (u [m,k], s [k], vh [k,n]) like svd_trunc."""
    m, n = a.shape
    if m <= n:
        g = a @ a.conj().T                          # [m, m]
        w, u = jnp.linalg.eigh(g)                   # ascending
        w = w[::-1][:k]
        u_k = u[:, ::-1][:, :k]
        s = jnp.sqrt(jnp.maximum(w, 0.0))
        inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
        vh = inv.astype(a.dtype)[:, None] * (u_k.conj().T @ a)
        return u_k, s, vh
    g = a.conj().T @ a                              # [n, n]
    w, v = jnp.linalg.eigh(g)
    w = w[::-1][:k]
    v_k = v[:, ::-1][:, :k]
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    u_k = (a @ v_k) * inv.astype(a.dtype)[None, :]
    return u_k, s, v_k.conj().T


def svd_trunc_auto(a: jnp.ndarray, k: int):
    """svd_trunc below RSVD_MIN_DIM (exact, keeps the 1e-10 accuracy bar of
    the small-D tests), rsvd_trunc above (the large-χ hot path).
    KPBP_LINALG=gram swaps the exact SVD for the eigh-of-gram variant."""
    m, n = a.shape
    if min(m, n) > max(RSVD_MIN_DIM, 4 * k):
        return rsvd_trunc(a, k)
    if _gram_mode():
        return svd_trunc_gram(a, k)
    return svd_trunc(a, k)


def robust_solve(n_mat: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Minimal-norm least-squares solve of the Hermitian-PSD system N x = b
    via spectral projection: components of b along near-null eigendirections
    are DROPPED, not Tikhonov-amplified.

    Replaces the reference's try/except escalation (libs/ITE.py:1452
    `robust_solve`) with something strictly safer for ALS: the environment
    Gram matrix N is rank-deficient whenever the state doesn't span the
    full bond space (e.g. a D_small state zero-padded into a larger D —
    UnitCell.pad_to). A Tikhonov solve fills the null space with
    b_null/ε junk that the *current* environment can't see but that
    poisons every subsequent edge update; the spectral pseudo-solve keeps
    the update inside the physically-supported subspace.
    """
    n_mat = 0.5 * (n_mat + jnp.conj(n_mat.T))
    w, u = jnp.linalg.eigh(n_mat)
    wmax = jnp.maximum(w[-1], 1e-300)
    rtol = max(rtol_for(n_mat.dtype), 1e-14)
    winv = jnp.where(w > rtol * wmax, 1.0 / jnp.where(w > 0, w, 1.0), 0.0)
    return u @ (winv.astype(b.dtype)[:, None] * (jnp.conj(u.T) @ b)
                if b.ndim > 1 else winv.astype(b.dtype) * (jnp.conj(u.T) @ b))


def eigh_psd_sqrt(n_mat: jnp.ndarray, rtol: float | None = None):
    """Hermitise, clip negative eigenvalues, return (X, w) with N ≈ X X†.

    Unlike the reference (libs/ITE.py:1198-1228) we keep the full static
    width and zero the clipped columns instead of slicing, so shapes stay
    static under jit. Returns the raw eigenvalues w for diagnostics.
    """
    if rtol is None:
        rtol = min(rtol_for(n_mat.dtype), 1e-12) if rtol_for(n_mat.dtype) < 1e-7 else 1e-6
    n_mat = 0.5 * (n_mat + jnp.conj(n_mat.T))
    w, u = jnp.linalg.eigh(n_mat)
    wmax = jnp.maximum(w[-1], 0.0)
    wpos = jnp.where(w > rtol * wmax, w, 0.0)
    x = u * jnp.sqrt(wpos)[None, :]
    return x, w


def pinv_reg(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.pinv(a, rtol=rtol_for(a.dtype))
