"""Open-boundary MPS with an explicit log-scale — the boundary-MPS workhorse.

Functional JAX re-design of the reference's ``bmpslib.mps``
(/root/reference/src/libs/bmpslib.py:214): sites are a tuple of
``[Dl, p, Dr]`` arrays (ragged but *static* shapes), plus a real scalar
``logscale`` replacing the reference's mantissa/exponent pair
(bmpslib.py:90-106) to keep giant contractions inside float range.

All functions are pure and jit-traceable for fixed site shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .linalg import qr_stable, svd_trunc, svd_trunc_auto


@jax.tree_util.register_pytree_node_class
@dataclass
class MPS:
    sites: Tuple[jnp.ndarray, ...]  # each [Dl, p, Dr]; ends have Dl=1 / Dr=1
    logscale: jnp.ndarray           # natural log of the overall scalar factor

    def tree_flatten(self):
        return (self.sites, self.logscale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children[0]), children[1])

    @property
    def n(self) -> int:
        return len(self.sites)

    @property
    def bond_dims(self) -> List[int]:
        return [s.shape[2] for s in self.sites[:-1]]

    @property
    def phys_dims(self) -> List[int]:
        return [s.shape[1] for s in self.sites]

    def reverse(self) -> "MPS":
        """Reverse site order (bond legs swap): the message wrap flip."""
        return MPS(tuple(jnp.transpose(s, (2, 1, 0)) for s in reversed(self.sites)), self.logscale)

    def scale_to(self, logscale) -> "MPS":
        """Return the same state with logscale set to `logscale` by
        multiplying the first site."""
        delta = self.logscale - logscale
        first = self.sites[0] * jnp.exp(delta).astype(self.sites[0].dtype)
        return MPS((first,) + self.sites[1:], jnp.asarray(logscale, self.logscale.dtype))


def _real_dtype(dtype):
    return jnp.zeros((), dtype).real.dtype


def from_sites(sites: Sequence[jnp.ndarray]) -> MPS:
    rd = _real_dtype(sites[0].dtype)
    return MPS(tuple(sites), jnp.zeros((), rd))


def extract_norms(mps: MPS) -> MPS:
    """Divide each site by its Frobenius norm, accumulating into logscale."""
    new_sites = []
    log = mps.logscale
    for s in mps.sites:
        nrm = jnp.linalg.norm(s)
        safe = jnp.maximum(nrm, 1e-300)
        new_sites.append(s / safe.astype(s.dtype))
        log = log + jnp.log(safe)
    return MPS(tuple(new_sites), log)


def canonicalize_left(mps: MPS) -> MPS:
    """Left-canonical gauge via a QR sweep (reference bmpslib.py:553).

    The trailing 1×1 R factor's magnitude goes into logscale, its phase into
    the last site, so the returned MPS has unit norm.
    """
    sites = list(mps.sites)
    log = mps.logscale
    carry = None  # R matrix to absorb into the next site
    for i in range(len(sites)):
        s = sites[i]
        if carry is not None:
            s = jnp.einsum("ab,bpc->apc", carry, s)
        dl, p, dr = s.shape
        q, r = qr_stable(s.reshape(dl * p, dr))
        k = q.shape[1]
        sites[i] = q.reshape(dl, p, k)
        carry = r
    scalar = carry[0, 0]  # last site has Dr=1 → carry is [1,1]
    nrm = jnp.maximum(jnp.abs(scalar), 1e-300)
    sites[-1] = sites[-1] * (scalar / nrm.astype(sites[-1].dtype))
    return MPS(tuple(sites), log + jnp.log(nrm))


def compress(mps: MPS, chi: int) -> MPS:
    """Truncate every bond to ≤ chi: left QR sweep, then right→left SVD sweep
    (the reference's `reduceD`, bmpslib.py:868). Output is right-canonical
    with unit norm and updated logscale."""
    m = canonicalize_left(mps)
    sites = list(m.sites)
    log = m.logscale
    carry = None  # [new, old] matrix absorbed leftward
    for i in range(len(sites) - 1, 0, -1):
        s = sites[i]
        if carry is not None:
            s = jnp.einsum("apb,bc->apc", s, carry)
        dl, p, dr = s.shape
        k = min(chi, dl, p * dr)
        u, sv, vh = svd_trunc_auto(s.reshape(dl, p * dr), k)
        sites[i] = vh.reshape(k, p, dr)
        carry = u * sv.astype(u.dtype)[None, :]
    s0 = sites[0]
    if carry is not None:
        s0 = jnp.einsum("apb,bc->apc", s0, carry)
    nrm = jnp.maximum(jnp.linalg.norm(s0), 1e-300)
    sites[0] = s0 / nrm.astype(s0.dtype)
    return MPS(tuple(sites), log + jnp.log(nrm))


def compress_iter(mps: MPS, chi: int, sweeps: int = 2) -> MPS:
    """SVD-free iterative compression — the reference's ``reduceDiter``
    (/root/reference/src/libs/bmpslib.py:989) re-designed for TPU.

    DMRG-like alternating sweeps: the guess MPS (bonds statically clipped to
    ≤ chi) is optimised against the original by projecting each site onto the
    current left/right isometry bases — two matmul ladders plus thin QRs, no
    SVD anywhere. All shapes are static, so the whole routine traces into one
    XLA program; the matmuls against the [D_orig, ≤chi] environments are the
    dominant cost and map straight onto the MXU.

    Output is right-canonical with unit norm (same contract as `compress`).
    """
    n = mps.n
    B = list(mps.sites)
    if n == 1 or max(s.shape[2] for s in B[:-1]) <= chi:
        return compress(mps, chi)  # nothing to truncate: cheap exact path

    log = mps.logscale
    tb = [min(B[i].shape[2], chi) for i in range(n - 1)]  # static target bonds

    # initial guess: slice the high indices (reference Step II)
    A: List[jnp.ndarray] = []
    for i, s in enumerate(B):
        dl = 1 if i == 0 else tb[i - 1]
        dr = 1 if i == n - 1 else tb[i]
        A.append(s[:dl, :, :dr])

    def upd_left(cl, b, q):
        # CL'[a2, g2] = Σ CL[a,g] B[a,p,a2] conj(Q[g,p,g2])
        x = jnp.tensordot(cl, b, axes=([0], [0]))          # [g, p, a2]
        return jnp.tensordot(x, jnp.conj(q), axes=([0, 1], [0, 1]))  # [a2, g2]

    def upd_right(cr, b, q):
        # CR'[a, g] = Σ B[a,p,a2] CR[a2,g2] conj(Q[g,p,g2])
        x = jnp.tensordot(b, cr, axes=([2], [0]))          # [a, p, g2]
        return jnp.tensordot(x, jnp.conj(q), axes=([1, 2], [1, 2]))  # [a, g]

    dt = B[0].dtype

    def right_canon(site):
        dl, p, dr = site.shape
        q, r = qr_stable(site.reshape(dl, p * dr).T)  # site = rᵀ·qᵀ
        return q.T.reshape(q.shape[1], p, dr), r.T

    # right-canonicalise the guess, building the right envs (reference Step II)
    R_env: List[jnp.ndarray] = [None] * (n + 1)  # type: ignore[list-item]
    R_env[n] = jnp.eye(B[-1].shape[2], dtype=dt)
    for i in range(n - 1, 0, -1):
        q, r = right_canon(A[i])
        A[i] = q
        A[i - 1] = jnp.tensordot(A[i - 1], r, axes=([2], [0]))
        R_env[i] = upd_right(R_env[i + 1], B[i], A[i])

    for _ in range(sweeps):
        # L → R
        cl = jnp.eye(B[0].shape[0], dtype=dt)
        L_env: List[jnp.ndarray] = [None] * n  # type: ignore[list-item]
        for i in range(n - 1):
            x = jnp.tensordot(B[i], R_env[i + 1], axes=([2], [0]))  # [a,p,g2]
            x = jnp.tensordot(cl, x, axes=([0], [0]))               # [g,p,g2]
            dl, p, dr = x.shape
            q, r = qr_stable(x.reshape(dl * p, dr))
            A[i] = q.reshape(dl, p, q.shape[1])
            A[i + 1] = jnp.tensordot(r, A[i + 1], axes=([1], [0]))
            cl = upd_left(cl, B[i], A[i])
            L_env[i] = cl
        # R → L
        cr = jnp.eye(B[-1].shape[2], dtype=dt)
        for i in range(n - 1, 0, -1):
            x = jnp.tensordot(B[i], cr, axes=([2], [0]))            # [a,p,g2]
            x = jnp.tensordot(L_env[i - 1], x, axes=([0], [0]))     # [g,p,g2]
            q, r = right_canon(x)
            A[i] = q
            A[i - 1] = jnp.tensordot(A[i - 1], r, axes=([2], [0]))
            cr = upd_right(cr, B[i], A[i])
            R_env[i] = cr

    s0 = A[0]
    nrm = jnp.maximum(jnp.linalg.norm(s0), 1e-300)
    A[0] = s0 / nrm.astype(s0.dtype)
    return MPS(tuple(A), log + jnp.log(nrm))


def inner(a: MPS, b: MPS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """⟨a|b*⟩ → (mantissa, log_magnitude_correction).

    Contracts the transfer ladder with per-step rescaling; the true value is
    ``mantissa · exp(log)`` including both MPSs' logscales.
    (reference: bmpslib.py:2288 mps_inner_product)
    """
    assert a.n == b.n
    rd = _real_dtype(a.sites[0].dtype)
    c = jnp.ones((1, 1), a.sites[0].dtype)
    log = a.logscale + b.logscale
    for i in range(a.n):
        # explicit 2-operand matmuls (the 3-operand einsum form hits an
        # unimplemented lowering on the experimental TPU backend for some
        # small complex shapes)
        sa, sb = a.sites[i], jnp.conj(b.sites[i])
        x, p, adim = sa.shape
        y, _, bdim = sb.shape
        t = c.T @ sa.reshape(x, p * adim)            # [y, p·a]
        t = t.reshape(y * p, adim)
        c = t.T @ sb.reshape(y * p, bdim)            # [a, b]
        nrm = jnp.maximum(jnp.linalg.norm(c), 1e-300)
        c = c / nrm.astype(c.dtype)
        log = log + jnp.log(nrm)
    return c[0, 0], log


def distance(a: MPS, b: MPS) -> jnp.ndarray:
    """1 − |⟨a|b⟩| / (‖a‖‖b‖) — scale-invariant message distance
    (reference: tensor_networks/mps.py:48)."""
    ab, log_ab = inner(a, b)
    aa, log_aa = inner(a, a)
    bb, log_bb = inner(b, b)
    log_ratio = log_ab - 0.5 * (log_aa + log_bb)
    ratio = jnp.abs(ab) / jnp.sqrt(jnp.abs(aa) * jnp.abs(bb)) * jnp.exp(log_ratio)
    return 1.0 - ratio


def add(a: MPS, b: MPS, wa=1.0, wb=1.0) -> MPS:
    """Direct-sum wa·|a⟩ + wb·|b⟩ (for BP damping; reference bmpslib.py:2781).

    Both MPSs are first brought to a common logscale.
    """
    assert a.n == b.n
    common = a.logscale
    if a.logscale is not b.logscale:
        # skip when both share the SAME logscale array (e.g. hermitize's
        # m ± m†): no rescale is needed, and the skipped exp(Δlog) avoids the
        # axon exp-of-log-chain miscompile (see fused._one_side_update)
        common = jnp.maximum(a.logscale, b.logscale)
        a = a.scale_to(common)
        b = b.scale_to(common)
    sites = []
    n = a.n
    for i in range(n):
        sa, sb = a.sites[i], b.sites[i]
        (la, p, ra), (lb, _, rb) = sa.shape, sb.shape
        if i == 0:
            s = jnp.concatenate([sa * wa, sb * wb], axis=2)
        elif i == n - 1:
            s = jnp.concatenate([sa, sb], axis=0)
        else:
            top = jnp.concatenate([sa, jnp.zeros((la, p, rb), sa.dtype)], axis=2)
            bot = jnp.concatenate([jnp.zeros((lb, p, ra), sa.dtype), sb], axis=2)
            s = jnp.concatenate([top, bot], axis=0)
        sites.append(s)
    return MPS(tuple(sites), common)


def dense(mps: MPS) -> jnp.ndarray:
    """Full tensor over the physical legs (tests/small sizes only).
    End bonds must be trivial (dim 1); they are squeezed away."""
    t = mps.sites[0]
    for s in mps.sites[1:]:
        t = jnp.tensordot(t, s, axes=([t.ndim - 1], [0]))
    assert t.shape[0] == 1 and t.shape[-1] == 1
    t = t.reshape(t.shape[1:-1])
    return t * jnp.exp(mps.logscale).astype(t.dtype)


def pad_bonds(mps: MPS, profile: Sequence[int]) -> MPS:
    """Zero-pad internal bonds up to `profile` (canonical static shapes)."""
    assert len(profile) == mps.n - 1
    sites = list(mps.sites)
    for k, target in enumerate(profile):
        cur = sites[k].shape[2]
        assert cur <= target, f"bond {k}: {cur} > profile {target}"
        if cur < target:
            pad = target - cur
            sites[k] = jnp.pad(sites[k], ((0, 0), (0, 0), (0, pad)))
            sites[k + 1] = jnp.pad(sites[k + 1], ((0, pad), (0, 0), (0, 0)))
    return MPS(tuple(sites), mps.logscale)


# ------------------------- message initialisation -------------------------


def uniform_message(D: int, n_sites: int, dtype=jnp.complex128) -> MPS:
    """Product of normalised vectorised identities: the "uniform quantum"
    initial message (reference: tensor_networks/mps.py:77 with random=False).

    Site tensor = reshaped identity on (bond⊗phys⊗bond) ket-bra pairs; here
    we use the equivalent minimal form: vec(I_D)/√D on each physical leg with
    trivial bonds, which represents the same product state after the
    reference's canonicalisation.
    """
    p = D * D
    v = (jnp.eye(D, dtype=dtype) / np.sqrt(D)).reshape(1, p, 1)
    return from_sites([v] * n_sites)


def classical_message(D: int, n_sites: int, key=None, dtype=jnp.complex128) -> MPS:
    """Classical (diagonal) initial messages: probability distributions on
    the fused D² physical leg's diagonal. key=None → uniform distribution
    ("UC"), else a random distribution ("RC"). The reference enumerates
    these models but raises NotImplemented for them
    (tensor_networks/mps.py:183-187); here they are supported.
    """
    p = D * D
    if key is None:
        diag = jnp.full((D,), 1.0 / D)
        return from_sites([jnp.diag(diag.astype(dtype)).reshape(1, p, 1)] * n_sites)
    keys = jax.random.split(key, n_sites)
    sites = []
    for k in keys:
        w = jax.random.uniform(k, (D,), minval=0.1, maxval=1.0)
        w = (w / jnp.sum(w)).astype(dtype)
        sites.append(jnp.diag(w).reshape(1, p, 1))
    return from_sites(sites)


def random_message(D: int, n_sites: int, key, dtype=jnp.complex128) -> MPS:
    """Random product of |v⟩⟨v| ket-bra vectorisations
    (reference: mps.py:77 with random=True, per-site independent)."""
    p = D * D
    keys = jax.random.split(key, n_sites)
    sites = []
    for k in keys:
        kr, ki = jax.random.split(k)
        v = jax.random.normal(kr, (D,))
        if jnp.issubdtype(dtype, jnp.complexfloating):
            v = v + 1j * jax.random.normal(ki, (D,))
        v = v.astype(dtype)
        v = v / jnp.linalg.norm(v)
        ketbra = jnp.outer(v, jnp.conj(v)).reshape(1, p, 1)
        sites.append(ketbra)
    return from_sites(sites)
