"""Small linear-algebra helpers shared by the MPS kernels and ITE.

All are jit-safe (static shapes) and work for real and complex dtypes on
both CPU (x64) and TPU (f32/c64 — verified op-by-op on the chip).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PINV_RTOL = 1e-10  # reference PINV_THRESH (libs/ITE.py:97-ish constants)
ROBUST_FACTOR = 1e8


def rtol_for(dtype) -> float:
    """Regularisation threshold scaled to the working precision: the
    reference's 1e-10 assumes float64; below float32 epsilon it would be a
    no-op, so widen it there."""
    import jax.numpy as jnp

    if jnp.finfo(jnp.zeros((), dtype).real.dtype).bits <= 32:
        return 1e-6
    return PINV_RTOL


def qr_stable(a: jnp.ndarray):
    """Thin QR with R's diagonal made real-nonnegative (unique gauge).

    The gauge fix keeps canonical forms deterministic across backends, which
    stabilises BP message distances.
    """
    q, r = jnp.linalg.qr(a, mode="reduced")
    d = jnp.diagonal(r, axis1=-2, axis2=-1)
    phase = jnp.where(jnp.abs(d) > 0, d / jnp.where(jnp.abs(d) > 0, jnp.abs(d), 1.0), 1.0)
    q = q * phase[..., None, :]
    r = r * jnp.conj(phase)[..., :, None]
    return q, r


def svd_trunc(a: jnp.ndarray, k: int):
    """SVD keeping the k largest singular values. k must be static.

    Returns (u [m,k], s [k], vh [k,n]).
    """
    u, s, vh = jnp.linalg.svd(a, full_matrices=False)
    return u[..., :, :k], s[..., :k], vh[..., :k, :]


def robust_solve(n_mat: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve N x = b with Tikhonov fallback when N is near-singular.

    jit-safe version of the reference's try/except escalation
    (libs/ITE.py:1452 `robust_solve`): always solve both the raw and the
    regularised system and select by a finite/size check.
    """
    norm_n = jnp.linalg.norm(n_mat, ord=2)
    eye = jnp.eye(n_mat.shape[0], dtype=n_mat.dtype)
    rtol = rtol_for(n_mat.dtype)
    x0 = jnp.linalg.solve(n_mat, b)
    x1 = jnp.linalg.solve(n_mat + eye * (rtol * norm_n), b)
    bad = ~jnp.isfinite(jnp.linalg.norm(x0)) | (
        jnp.linalg.norm(x0) > ROBUST_FACTOR * jnp.linalg.norm(b) / jnp.maximum(norm_n, 1e-300)
    )
    return jnp.where(bad, x1, x0)


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
