"""Plan executor: runs a compiled contraction Plan as pure JAX ops.

The executor is shape-static: for a fixed Plan, tracing produces one XLA
program (cached by jit). State = (frontier site list, logscale, phase
mantissa).  Each step contracts one tensor into the frontier MPS, re-splits
via QR, and compresses to χ when the plan says so — the swallow/‌truncate
cycle of the reference's bubblecon (libs/bubblecon.py:2844-3062) but traced
once and fused by XLA.
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..networks.graph import Source
from ..planner.compiler import Plan, Step
from .linalg import qr_stable
from . import mps as mpslib
from .mps import MPS


def _split_blob(blob: jnp.ndarray, out_dims: Sequence[int]) -> List[jnp.ndarray]:
    """Split blob [Dl, o1..ok, Dr] into k MPS sites via a QR chain."""
    k = len(out_dims)
    dl = blob.shape[0]
    dr = blob.shape[-1]
    if k == 1:
        return [blob]
    sites = []
    left = dl
    rest = 1
    for od in out_dims:
        rest *= od
    carry = blob.reshape(left, rest * dr)
    for i, od in enumerate(out_dims[:-1]):
        rest //= od
        m = carry.reshape(left * od, rest * dr)
        q, r = qr_stable(m)
        bond = q.shape[1]
        sites.append(q.reshape(left, od, bond))
        carry = r
        left = bond
    sites.append(carry.reshape(left, out_dims[-1], dr))
    return sites


def execute_plan(
    plan: Plan,
    fetch: Callable[[Source], jnp.ndarray],
    dtype=None,
):
    """Run the plan. Returns an ``MPS`` over the final frontier — or, for a
    full contraction (empty frontier), a tuple (mantissa, log) with
    value = mantissa·exp(log) (the reference's separate_exp mode,
    bubblecon.py:3084)."""
    sites: List[jnp.ndarray] = []
    logscale = None
    mantissa = None

    for step in plan.steps:
        t = fetch(step.source)
        if dtype is not None:
            t = t.astype(dtype)
        if logscale is None:
            rd = jnp.zeros((), t.dtype).real.dtype
            logscale = jnp.zeros((), rd)
            mantissa = jnp.ones((), t.dtype)
        t = jnp.transpose(t, step.perm)

        s, n_in, n_out = step.start, step.n_in, step.n_out

        if n_in == 0:
            # first node of the sweep: insert fresh sites
            assert not sites, "zero-in-leg step on a non-empty frontier"
            blob = t.reshape((1,) + t.shape + (1,))
        else:
            # contract t's in-legs with the consumed frontier sites one by one.
            # t legs: [in0..in_{n_in-1}, out...]; walk the sites left→right.
            consumed = sites[s : s + n_in]
            # running: [Dl, (remaining in legs), out..., bond]
            run = consumed[0]  # [Dl, p0, b0]
            run = jnp.tensordot(t, run, axes=([0], [1]))  # [in1.., out.., Dl, b0]
            # move Dl to front: current shape [in1..in_{n_in-1}, out.., Dl, b]
            nd = run.ndim
            run = jnp.moveaxis(run, nd - 2, 0)  # [Dl, in1.., out.., b]
            for j in range(1, n_in):
                site = consumed[j]  # [b, p_j, b']
                # contract run's leg `1` (next in-leg) and last axis (bond)
                run = jnp.tensordot(run, site, axes=([1, run.ndim - 1], [1, 0]))
                # shape now [Dl, in.., out.., b']
            blob = run  # [Dl, out..., Dr]

        # normalise scale to keep floats healthy
        nrm = jnp.maximum(jnp.linalg.norm(blob), 1e-300)
        blob = blob / nrm.astype(blob.dtype)
        logscale = logscale + jnp.log(nrm)

        if n_out == 0:
            mat = blob.reshape(blob.shape[0], blob.shape[-1])  # [Dl, Dr]
            del sites[s : s + n_in]
            if s > 0:
                sites[s - 1] = jnp.einsum("apb,bc->apc", sites[s - 1], mat)
            elif sites:
                sites[0] = jnp.einsum("ab,bpc->apc", mat, sites[0])
            else:
                mantissa = mantissa * mat[0, 0]
        else:
            new_sites = _split_blob(blob, step.out_dims)
            sites[s : s + n_in] = new_sites

        if step.compress_after and sites:
            m = mpslib.MPS(tuple(sites), logscale)
            m = mpslib.compress(m, plan.chi)
            sites = list(m.sites)
            logscale = m.logscale

    if not sites:
        return mantissa, logscale

    # fold the phase mantissa into the first site
    first = sites[0] * mantissa
    out = MPS((first,) + tuple(sites[1:]), logscale)
    return out
