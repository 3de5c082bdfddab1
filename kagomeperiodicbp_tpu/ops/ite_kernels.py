"""ITE numeric kernels: 2-site RDM, Lubasch reduced environment, ALS bond
truncation, and gate application.

Faithful JAX re-derivations of the reference's math
(/root/reference/src/libs/ITE.py): same equations, jit-safe static shapes
(eigenvalue clipping zeroes columns instead of slicing, the robust solver
always computes both branches).

Leg conventions (the canonical EdgeTN layout):
* pair kets  t1, t2: [d, e, x1, x2, x3] — physical, shared edge, then the 3
  environment legs counterclockwise;
* env: 6 tensors [prev, ket, bra, next] in ccw order starting from t1's
  first env leg (reference rho_ij docstring, ITE.py:555-597).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .linalg import eigh_psd_sqrt, pinv_reg, qr_stable, robust_solve

Tensor = jnp.ndarray


def rho_ij(t1: Tensor, t2: Tensor, env: Sequence[Tensor]) -> Tensor:
    """2-site RDM ρ[i_ket, i_bra, j_ket, j_bra], trace-normalised.
    (reference: ITE.py:555, mps-env mode)"""
    a_i = jnp.einsum(
        "deabc,DExyz,paxq,qbyr,rczs->dDeEps",
        t1, jnp.conj(t1), env[0], env[1], env[2],
        optimize=True,
    )
    a_j = jnp.einsum(
        "feabc,FExyz,saxq,qbyr,rczp->fFeEsp",
        t2, jnp.conj(t2), env[3], env[4], env[5],
        optimize=True,
    )
    rho = jnp.einsum("iIeEps,jJeEsp->iIjJ", a_i, a_j, optimize=True)
    tr = jnp.einsum("iijj->", rho)
    return rho / tr


def expectation(rho: Tensor, op: Tensor) -> Tensor:
    """⟨op⟩ = Σ ρ∘op with both in [i_ket,i_bra,j_ket,j_bra] layout
    (reference: measurements.py:134)."""
    return jnp.einsum("iIjJ,iIjJ->", rho, op)


# ----------------------------- reduced env --------------------------------


def _qr_reduce(t: Tensor) -> Tuple[Tensor, Tensor]:
    """Split t[d, e, rest...] = a[d, e, r] · t_rest[r, rest...] via QR.
    (reference: ITE.py:948-968)"""
    d, e = t.shape[0], t.shape[1]
    rest_shape = t.shape[2:]
    rest = 1
    for s in rest_shape:
        rest *= s
    m = t.reshape(d * e, rest)
    # m.T = Q R  ⇒  m = R.T Q.T = a · t_rest
    q, r = qr_stable(m.T)
    a = r.T.reshape(d, e, r.shape[0])
    t_rest = q.T.reshape((q.shape[1],) + rest_shape)
    return a, t_rest


def _half_env(t_rest: Tensor, env_sites: Sequence[Tensor]) -> Tensor:
    """N_half[r, r*, up, down] = t_rest (+conj) sandwiched with its 3 env
    sites (reference: ITE.py:1033-1146). `up` is the env bond entering the
    first site, `down` the bond leaving the last."""
    n = jnp.einsum(
        "tabc,paxq,qbym,mczs,Txyz->tTps",
        t_rest, env_sites[0], env_sites[1], env_sites[2], jnp.conj(t_rest),
        optimize=True,
    )
    # legs: [r, r*, up(prev bond of first site), down(next bond of last site)]
    return n / jnp.linalg.norm(n)


def reduced_env(
    t1: Tensor, t2: Tensor, env: Sequence[Tensor]
) -> Tuple[Tensor, Tensor, Tensor, Tensor, Tensor, Tensor]:
    """Lubasch-style reduced environment (reference: ITE.py:853).

    Returns (X, a1, a2, t1_rest, t2_rest, eigvals) with
    N_red ≈ X·X†, t_i = a_i · t_i_rest,
    X: [r1, r2, x], a_i: [d, e, r_i].
    """
    a1, t1_rest = _qr_reduce(t1)
    a2, t2_rest = _qr_reduce(t2)

    n1 = _half_env(t1_rest, env[0:3])   # [r1, r1*, p, s]
    n2 = _half_env(t2_rest, env[3:6])   # [r2, r2*, s, p]

    nred = jnp.einsum("rRps,qQsp->rqRQ", n1, n2, optimize=True)
    r1, r2 = nred.shape[0], nred.shape[1]
    nred = nred.reshape(r1 * r2, r1 * r2)

    x, w = eigh_psd_sqrt(nred)
    x = x.reshape(r1, r2, x.shape[1])   # [r1, r2, xdim]

    # gauge fixing (reference ITE.py:1234-1276): QR on each reduced leg,
    # absorb L into a1 / R into a2 and their inverses into X and t_rests.
    xt = x.reshape(r1, r2 * x.shape[2])
    _, ri = qr_stable(xt.T)
    li = ri.T                      # [r1, r1']
    li_inv = pinv_reg(li)

    xt2 = jnp.transpose(x, (0, 2, 1)).reshape(r1 * x.shape[2], r2)
    _, rj = qr_stable(xt2)
    rj_inv = pinv_reg(rj)          # rj: [r2', r2]

    x = jnp.tensordot(li_inv, x, axes=([1], [0]))        # [r1', r2, xdim]
    t1_rest = jnp.tensordot(li_inv, t1_rest, axes=([1], [0]))
    a1 = jnp.tensordot(a1, li, axes=([2], [0]))          # [d, e, r1']

    x = jnp.tensordot(x, rj_inv.T, axes=([1], [0]))      # [r1', xdim, r2']
    x = jnp.transpose(x, (0, 2, 1))                      # [r1', r2', xdim]
    t2_rest = jnp.tensordot(rj_inv.T, t2_rest, axes=([1], [0]))
    a2 = jnp.tensordot(a2, rj.T, axes=([2], [0]))        # [d, e, r2']

    return x, a1, a2, t1_rest, t2_rest, w


# ----------------------------- ALS truncation -----------------------------


def _local_env(a_other: Tensor, a_other_bra: Tensor, x: Tensor) -> Tensor:
    """N_i[d,e,r; d*,e*,r*] with the identity on the physical leg
    (reference: Ni_env, ITE.py:1394)."""
    ket = jnp.einsum("dEr,arx->dEax", a_other, x)
    n = jnp.einsum("dEax,dFbx->EaFb", ket, jnp.conj(jnp.einsum("dEr,arx->dEax", a_other_bra, x)))
    d = a_other.shape[0]
    eye = jnp.eye(d, dtype=a_other.dtype)
    return jnp.einsum("pq,EaFb->pEaqFb", eye, n)


def truncation_distance(ea1, ea2, na1, na2, x) -> Tensor:
    """‖ψ_exact − ψ_new‖² normalised (reference: ITE.py:1334)."""

    def ip(b1, b2, k1, k2):
        ket = jnp.einsum("der,rsx->desx", k1, x)
        ket = jnp.einsum("fes,desx->fdx", k2, ket)
        bra = jnp.einsum("der,rsx->desx", b1, x)
        bra = jnp.einsum("fes,desx->fdx", b2, bra)
        return jnp.einsum("fdx,fdx->", ket, jnp.conj(bra))

    ip1 = ip(ea1, ea2, ea1, ea2)
    ip2 = ip(na1, na2, na1, na2)
    ip3 = ip(na1, na2, ea1, ea2)
    return (2 * (ip1 + ip2 - 2 * ip3) / (ip1 + ip2)).real


def als_optimize(
    d_max: int, exact_a1: Tensor, exact_a2: Tensor, x: Tensor, n_iter: int = 10
) -> Tuple[Tensor, Tensor]:
    """Alternating-least-squares truncation of the shared bond to d_max
    (reference: ALS_optimization, ITE.py:1518). Fixed iteration count for
    jit-friendliness (the reference caps at 10 with an eps break)."""
    d = exact_a1.shape[0]
    r1, r2 = exact_a1.shape[2], exact_a2.shape[2]
    new_a1 = exact_a1[:, :d_max, :]
    new_a2 = exact_a2[:, :d_max, :]

    for _ in range(n_iter):
        # solve for a1
        n1 = _local_env(new_a2, new_a2, x)          # [p,E,a,q,F,b]
        n1m = n1.reshape(d * d_max * r1, d * d_max * r1).T
        n1b = _local_env(exact_a2, new_a2, x)
        b = jnp.einsum("pEaqFb,pEa->qFb", n1b, exact_a1).reshape(-1)
        a1 = robust_solve(n1m, b).reshape(new_a1.shape)
        new_a1 = a1

        # solve for a2
        n2 = _local_env(new_a1, new_a1, _swap_x(x))
        n2m = n2.reshape(d * d_max * r2, d * d_max * r2).T
        n2b = _local_env(exact_a1, new_a1, _swap_x(x))
        b = jnp.einsum("pEaqFb,pEa->qFb", n2b, exact_a2).reshape(-1)
        a2 = robust_solve(n2m, b).reshape(new_a2.shape)
        new_a2 = a2

        # gauge fix (reference ITE.py:1688-1729): QR/LQ + SVD of the middle
        q1, r1m = qr_stable(jnp.transpose(new_a1, (0, 2, 1)).reshape(d * r1, d_max))
        q2, r2m = qr_stable(
            jnp.transpose(new_a2, (1, 0, 2)).reshape(d_max, d * r2).T
        )
        l2 = r2m.T
        mid = r1m @ l2
        u, s, vh = jnp.linalg.svd(mid, full_matrices=False)
        sq = jnp.sqrt(s)
        left = (q1 @ u) * sq.astype(q1.dtype)[None, :]
        right = (sq.astype(q1.dtype)[:, None] * vh) @ q2.T
        new_a1 = jnp.transpose(left.reshape(d, r1, d_max), (0, 2, 1))
        new_a2 = jnp.transpose(right.reshape(d_max, d, r2), (1, 0, 2))

    new_a1 = new_a1 / jnp.linalg.norm(new_a1)
    new_a2 = new_a2 / jnp.linalg.norm(new_a2)
    return new_a1, new_a2


def _swap_x(x: Tensor) -> Tensor:
    return jnp.transpose(x, (1, 0, 2))


# --------------------------- gate application -----------------------------


def gate_from_hamiltonian(h: Tensor, dt) -> Tensor:
    """g = exp(−dt·h) in [i_ket, i_bra, j_ket, j_bra] layout
    (reference: g_from_exp_h, ITE.py:2027)."""
    d = h.shape[0]
    m = jnp.transpose(h, (0, 2, 1, 3)).reshape(d * d, d * d)
    g = jax.scipy.linalg.expm(-dt * m)
    return jnp.transpose(g.reshape(d, d, d, d), (0, 2, 1, 3))


def apply_gate(
    g: Optional[Tensor],
    d_max: int,
    t1: Tensor,
    t2: Tensor,
    env: Sequence[Tensor],
    als_iters: int = 10,
) -> Tuple[Tensor, Tensor, Tensor]:
    """Apply a 2-local gate on the pair and ALS-truncate the bond to d_max
    (reference: apply_2local_gate, ITE.py:1761). Returns (t1', t2', eigvals
    of the raw reduced env)."""
    x, a1, a2, t1_rest, t2_rest, w = reduced_env(t1, t2, env)
    d = a1.shape[0]
    r1, r2 = a1.shape[2], a2.shape[2]

    # apply gate on the reduced pair: θ[i,r1,j,r2] = Σ g[i,I,j,J]·a1[I,e,r1]·a2[J,e,r2]
    if g is None:
        theta = jnp.einsum("Ier,Jes->IrJs", a1, a2, optimize=True)
    else:
        theta = jnp.einsum("iIjJ,Ier,Jes->irjs", g, a1, a2, optimize=True)
    # theta legs [d_i, r1, d_j, r2] → matrix [d·r1, d·r2]
    m = theta.reshape(d * r1, d * r2)
    u, s, vh = jnp.linalg.svd(m, full_matrices=False)
    sq = jnp.sqrt(s)
    ea1 = (u * sq.astype(u.dtype)[None, :]).reshape(d, r1, -1)
    ea1 = jnp.transpose(ea1, (0, 2, 1))               # [d, Dp, r1]
    ea2 = (sq.astype(u.dtype)[:, None] * vh).reshape(-1, d, r2)
    ea2 = jnp.transpose(ea2, (1, 0, 2))               # [d, Dp, r2]

    new_a1, new_a2 = als_optimize(d_max, ea1, ea2, x, n_iter=als_iters)

    t1_new = jnp.tensordot(new_a1, t1_rest, axes=([2], [0]))
    t2_new = jnp.tensordot(new_a2, t2_rest, axes=([2], [0]))
    t1_new = t1_new / jnp.max(jnp.abs(t1_new))
    t2_new = t2_new / jnp.max(jnp.abs(t2_new))
    return t1_new, t2_new, w
