"""Fused jitted programs: one XLA program per BP iteration / edge update /
edge measurement.

The Python-level algorithm drivers (bp.py, ite.py, measurements.py) were
originally composed of many small eager ops; on the TPU's remote compiler
each unique op costs seconds to compile and ~0.5 ms to dispatch, so whole
segments were glue-bound. Here entire algorithmic units trace into single
programs, cached per static signature (and persisted via the compilation
cache).
"""
from __future__ import annotations

import functools
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..enums import UpdateEdge, UnitCellFlavor
from ..lattices import BlockSide, KagomeBlock
from ..networks.graph import message_bond_profile
from ..ops import ite_kernels as K
from ..ops import mps as mpslib
from ..ops.contract import execute_plan
from ..ops.mps import MPS
from ..utils.jaxtools import resilient_jit
from . import contraction as C
from . import edge_env as E

MsgSites = Dict[int, Tuple[jnp.ndarray, ...]]  # side int → site arrays


# ------------------------------ helpers -----------------------------------


def _msgs_to_sites(messages) -> MsgSites:
    return {int(s): tuple(m.sites) for s, m in messages.items()}


def _sites_to_msgs(sites: MsgSites, rd=jnp.float32):
    out = {}
    for s, ss in sites.items():
        out[BlockSide(s)] = MPS(tuple(ss), jnp.zeros((), ss[0].real.dtype if hasattr(ss[0], 'real') else rd))
    return out


def _make_fetch(fused, msg_sites: MsgSites):
    def fetch(source):
        if source[0] == "lat":
            return fused[source[1] % len(fused)]
        _, side, k = source
        return msg_sites[side][k]

    return fetch


def _one_outgoing(tensors, msg_sites: MsgSites, N, D, chi, chi_msg, toward: int,
                  single: bool = False):
    """Traced: outgoing message toward `toward`, canonical profile, unit
    scale. (= contraction.outgoing_message, inlined for fusing)

    single=True → single-layer swallowing (`tensors` are raw ket tensors,
    not fused double-layer ones; reference bubblecon.py:1855)."""
    plan = C.to_message_plan(N, D, chi, chi_msg, toward)
    if single:
        plan = C.single_layer_plan(plan)
        fetch = C._make_fetch(None, msg_sites, kets=tuple(tensors))
    else:
        fetch = _make_fetch(tensors, msg_sites)
    raw = execute_plan(plan, fetch)
    return C.message_postprocess(raw, plan, N, D, chi_msg)


# --------------------------- fused BP iteration ----------------------------


@functools.lru_cache(maxsize=None)
def _post_jit(N: int, D: int, chi: int, chi_msg: int, toward: int, single: bool):
    """jitted (raw_sites, raw_log) → (wrapped_sites, logscale): the message
    postprocess tail (corner fold + compress + pad + reverse) as its own
    small program — the stepwise tier's counterpart of the fused tail."""
    plan = C.to_message_plan(N, D, chi, chi_msg, toward)
    if single:
        plan = C.single_layer_plan(plan)

    def impl(raw_sites, raw_log):
        raw = MPS(tuple(raw_sites), raw_log)
        out = C.message_postprocess(raw, plan, N, D, chi_msg)
        wrapped = out.reverse()
        return tuple(wrapped.sites), wrapped.logscale

    return resilient_jit(impl)


@functools.lru_cache(maxsize=None)
def _stepwise_outgoing(N: int, D: int, chi: int, chi_msg: int,
                       toward: int, single: bool):
    """(fused, msg_sites) → (wrapped_sites, logscale) via ONE JITTED PROGRAM
    PER PLAN STEP (ops/contract.execute_plan_stepwise) plus the small
    postprocess program — the middle tier of the degraded-backend ladder."""
    plan = C.to_message_plan(N, D, chi, chi_msg, toward)
    if single:
        plan = C.single_layer_plan(plan)
    post = _post_jit(N, D, chi, chi_msg, toward, single)

    def call(fused, msg_sites: MsgSites):
        from ..ops.contract import execute_plan_stepwise

        if single:
            fetch = C._make_fetch(None, msg_sites, kets=tuple(fused))
        else:
            fetch = _make_fetch(fused, msg_sites)
        raw = execute_plan_stepwise(plan, fetch)
        return post(tuple(raw.sites), raw.logscale)

    return call


@functools.lru_cache(maxsize=None)
def _one_side_outgoing_jit(N: int, D: int, chi: int, chi_msg: int,
                           toward: int, single: bool):
    """jitted (fused, msg_sites) → (wrapped_sites, logscale): the outgoing
    message of one side, wrapped.  The distance is deliberately NOT in this
    program — see _one_side_update.  When the backend rejects every compile
    of the whole-side program, resilient_jit degrades it to the stepwise
    tier (which degrades its own per-step programs to eager individually)."""

    def impl(fused, msg_sites: MsgSites):
        out = _one_outgoing(fused, msg_sites, N, D, chi, chi_msg, toward,
                            single=single)
        wrapped = out.reverse()
        return tuple(wrapped.sites), wrapped.logscale

    return resilient_jit(
        impl, fallback=_stepwise_outgoing(N, D, chi, chi_msg, toward, single))


@functools.lru_cache(maxsize=None)
def _distance_parts_jit():
    """jitted (old_sites, new_sites, new_log) → (r0, lr) distance parts."""

    def impl(old_sites, new_sites, new_log):
        old = MPS(tuple(old_sites), jnp.zeros((), new_log.dtype))
        new = MPS(tuple(new_sites), new_log)
        ab, lab = mpslib.inner(old, new)
        aa, laa = mpslib.inner(old, old)
        bb, lbb = mpslib.inner(new, new)
        r0 = jnp.abs(ab) / jnp.sqrt(jnp.abs(aa) * jnp.abs(bb))
        lr = lab - 0.5 * (laa + lbb)
        return r0, lr

    return resilient_jit(impl)


@functools.lru_cache(maxsize=None)
def _one_side_update(N: int, D: int, chi: int, chi_msg: int,
                     damped: bool, toward: int, single: bool = False):
    """(fused, msg_sites[, damping]) → (wrapped_sites, r0, lr) for one side.
    Damping is *data* (a traced scalar), so its strength can change
    mid-run without recompiling; only damped-vs-undamped selects between two
    program variants (the undamped one skips a compress sweep entirely).

    Kept per-side (rather than one 6-side program) deliberately: the
    experimental axon compiler miscompiles very large programs into
    executables that fail with UNIMPLEMENTED at run time; programs of this
    size are verified good.

    On axon the (undamped) work is further split into TWO programs —
    outgoing contraction, then distance parts: combining the message plan
    and the three inner-product ladders in one program reliably miscompiles
    there (round-3 bisect), while each half executes correctly."""
    from .batched import _on_axon

    force_stepwise = os.environ.get("KPBP_EXEC") == "stepwise"
    if (_on_axon() or force_stepwise) and not damped:
        out_fn = (
            _stepwise_outgoing(N, D, chi, chi_msg, toward, single)
            if force_stepwise
            else _one_side_outgoing_jit(N, D, chi, chi_msg, toward, single)
        )
        parts_fn = _distance_parts_jit()
        tgt = int(BlockSide(toward).opposite())

        def split_call(fused, msg_sites: MsgSites):
            new_sites, new_log = out_fn(fused, msg_sites)
            r0, lr = parts_fn(msg_sites[tgt], new_sites, new_log)
            return new_sites, r0, lr

        return split_call

    def impl(fused, msg_sites: MsgSites, damping=None):
        out = _one_outgoing(fused, msg_sites, N, D, chi, chi_msg, toward,
                            single=single)
        wrapped = out.reverse()
        tgt = int(BlockSide(toward).opposite())
        old = MPS(tuple(msg_sites[tgt]), jnp.zeros_like(wrapped.logscale))
        # message distance, SPLIT: the mantissa ratio r0 and log ratio lr are
        # computed here, but the final 1 − r0·exp(lr) lives in a separate
        # tiny program (_combine_distances).  The axon remote compiler
        # deterministically miscompiles exp() applied to a ladder-accumulated
        # log chain inside a larger program (UNIMPLEMENTED at run time,
        # bisected round 3); exp of a plain scalar input is fine.
        ab, lab = mpslib.inner(old, wrapped)
        aa, laa = mpslib.inner(old, old)
        bb, lbb = mpslib.inner(wrapped, wrapped)
        r0 = jnp.abs(ab) / jnp.sqrt(jnp.abs(aa) * jnp.abs(bb))
        lr = lab - 0.5 * (laa + lbb)
        if damped:
            d = jnp.asarray(damping, wrapped.logscale.dtype)
            mixed = mpslib.add(wrapped, old, 1.0 - d, d)
            mixed = mpslib.compress(mixed, chi_msg)
            mixed = mpslib.pad_bonds(mixed, message_bond_profile(N, D, chi_msg))
            wrapped = MPS(mixed.sites, jnp.zeros_like(mixed.logscale))
        return tuple(wrapped.sites), r0, lr

    return resilient_jit(impl)


@functools.lru_cache(maxsize=None)
def _combine_distances():
    """jitted (r0[6], lr[6]) → mean message distance.  Tiny on purpose: see
    the exp-miscompile note in _one_side_update."""

    def impl(r0s, lrs):
        return jnp.mean(1.0 - r0s * jnp.exp(lrs))

    return resilient_jit(impl)


def bp_iteration(N: int, D: int, chi: int, chi_msg: int, damping: Optional[float],
                 single: bool = False):
    """(fused, msg_sites[, damping]) → (new_msg_sites, mean_distance): one
    synchronous BP sweep, dispatched as 6 per-side jitted programs. The
    damping strength may be overridden per call without recompiling.

    single=True → single-layer swallowing; pass raw ket cell tensors in
    place of the fused ones."""
    damped = bool(damping)
    fns = {int(s): _one_side_update(N, D, chi, chi_msg, damped, int(s), single)
           for s in BlockSide}

    def run(fused, msg_sites: MsgSites, damping_value: Optional[float] = None):
        d = damping_value if damping_value is not None else (damping or 0.0)
        new: MsgSites = {}
        r0s, lrs = [], []
        for side in BlockSide:
            if damped:
                wrapped, r0, lr = fns[int(side)](fused, msg_sites, d)
            else:
                wrapped, r0, lr = fns[int(side)](fused, msg_sites)
            new[int(side.opposite())] = wrapped
            r0s.append(r0)
            lrs.append(lr)
        err = _combine_distances()(jnp.stack(r0s), jnp.stack(lrs))
        return new, err

    return run


@functools.lru_cache(maxsize=None)
def hermitize_all(N: int, D: int, chi_msg: int):
    """jitted msg_sites → hermitized msg_sites (reference ITE.py:116)."""
    from .bp import hermitize_message

    def impl(msg_sites: MsgSites):
        out = {}
        for s, ss in msg_sites.items():
            rd = jnp.zeros((), ss[0].dtype).real.dtype
            m = MPS(tuple(ss), jnp.zeros((), rd))
            out[s] = tuple(hermitize_message(m, D, chi_msg).sites)
        return out

    return resilient_jit(impl)


# --------------------------- fused edge update -----------------------------


# single implementation lives in edge_env.edge_environment_sites; kept as an
# alias for the jitted wrappers below and parallel/multichip.py
_edge_env_traced = E.edge_environment_sites


def _rho_health(rho):
    d1, d2 = rho.shape[0], rho.shape[2]
    m = jnp.transpose(rho, (0, 2, 1, 3)).reshape(d1 * d2, d1 * d2)
    herm = jnp.linalg.norm(m - jnp.conj(m.T)) / jnp.maximum(jnp.linalg.norm(m), 1e-300)
    mh = 0.5 * (m + jnp.conj(m.T))
    w = jnp.linalg.eigvalsh(mh)
    sum_eig = jnp.sum(w)
    # negativity from the partial transpose (hermitian for hermitian ρ)
    pt = jnp.transpose(rho, (0, 3, 2, 1)).reshape(d1 * d2, d1 * d2)
    pt = 0.5 * (pt + jnp.conj(pt.T))
    wpt = jnp.linalg.eigvalsh(pt)
    neg = jnp.sum(jnp.where(wpt < 0, -wpt, 0.0))
    return herm, sum_eig, neg


def _unpermute(t, perm):
    inv = [0] * 4
    for i, p in enumerate(perm):
        inv[p] = i
    return jnp.transpose(t, (0,) + tuple(i + 1 for i in inv))


@functools.lru_cache(maxsize=None)
def _edge_env_jit(N: int, D: int, chi: int, chi_msg: int, edge: UpdateEdge):
    """jitted (cells, msg_sites) → (t1, t2, env) — the sandwich env alone."""

    def impl(cells, msg_sites: MsgSites):
        t1, t2, env, _ = _edge_env_traced(cells, msg_sites, N, chi, chi_msg, edge)
        return t1, t2, env

    return resilient_jit(impl)


@functools.lru_cache(maxsize=None)
def _gate_als_jit(D: int, edge: UpdateEdge, als_iters: int, normalize: bool):
    """jitted (t1, t2, env, h, dt) → (t1n, t2n, energy, herm, sum_eig, neg)."""

    def impl(t1, t2, env, h, dt):
        g = K.gate_from_hamiltonian(h, dt)
        t1n, t2n, w = K.apply_gate(g, D, t1, t2, env, als_iters=als_iters)
        rho = K.rho_ij(t1n, t2n, env)
        energy = jnp.real(jnp.einsum("iIjJ,iIjJ->", rho, h))
        herm, sum_eig, neg = _rho_health(rho)
        if normalize:
            t1n = t1n / jnp.linalg.norm(t1n)
            t2n = t2n / jnp.linalg.norm(t2n)
        return t1n, t2n, energy, herm, sum_eig, neg

    return resilient_jit(impl)


def edge_update(N: int, D: int, chi: int, chi_msg: int, edge: UpdateEdge,
                als_iters: int, normalize: bool):
    """(cells, msg_sites, h, dt) → (new_cells, energy, herm, sum_eig, neg).

    One full ITE edge update (reference _tn_update.py:165), dispatched as
    two medium jitted programs (env; gate+ALS) — see _one_side_update note.
    """
    env_fn = _edge_env_jit(N, D, chi, chi_msg, edge)
    als_fn = _gate_als_jit(D, edge, als_iters, normalize)

    block = KagomeBlock.build(N)
    n1, n2 = E.edge_pair(block, edge)

    def run(cells, msg_sites: MsgSites, h, dt):
        t1, t2, env = env_fn(cells, msg_sites)
        t1n, t2n, energy, herm, sum_eig, neg = als_fn(t1, t2, env, h, dt)
        # recover the write-back permutations (host-side, static)
        _, p1 = E._canonical_ket(lambda v: cells[v % len(cells)], block, n1, edge.direction())
        _, p2 = E._canonical_ket(lambda v: cells[v % len(cells)], block, n2,
                                 edge.direction().opposite())
        new_cells = list(cells)
        new_cells[int(edge.first)] = _unpermute(t1n, p1)
        new_cells[int(edge.second)] = _unpermute(t2n, p2)
        return tuple(new_cells), energy, herm, sum_eig, neg

    return run


@functools.lru_cache(maxsize=None)
def _measure_from_env_jit(edge: UpdateEdge):
    """jitted (t1, t2, env, h) → (energy, neg, exps)."""

    def impl(t1, t2, env, h):
        rho = K.rho_ij(t1, t2, env)
        energy = jnp.einsum("iIjJ,iIjJ->", rho, h)
        _, _, neg = _rho_health(rho)
        rho_i = jnp.einsum("iIjj->iI", rho)
        rho_j = jnp.einsum("iijJ->jJ", rho)
        from ..physics import pauli

        exps = {}
        for name in ("x", "y", "z"):
            op = jnp.asarray(pauli.ALL[name], dtype=rho.dtype)
            exps[name] = (
                jnp.einsum("iI,Ii->", rho_i, op),
                jnp.einsum("jJ,Jj->", rho_j, op),
            )
        return energy, neg, exps

    return resilient_jit(impl)


def edge_measure(N: int, D: int, chi: int, chi_msg: int, edge: UpdateEdge):
    """(cells, msg_sites, h) → (energy, negativity, ⟨xyz⟩ per site) — one
    per-edge measurement (reference measurements.py:163 inner loop)."""
    env_fn = _edge_env_jit(N, D, chi, chi_msg, edge)
    meas_fn = _measure_from_env_jit(edge)

    def run(cells, msg_sites: MsgSites, h):
        t1, t2, env = env_fn(cells, msg_sites)
        return meas_fn(t1, t2, env, h)

    return run
