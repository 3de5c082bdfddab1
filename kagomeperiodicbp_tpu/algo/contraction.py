"""Contraction facade: binds unit-cell tensors + messages to compiled plans
and runs them (jit-cached per plan).

Equivalent role to the reference's `contract_tensor_network`
(/root/reference/src/algo/contract_tensor_network.py:146), with the
order-derivation + corner-message handling moved into the plan compiler.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..lattices import BlockSide, KagomeBlock
from ..networks.graph import TNGraph, full_graph, message_bond_profile
from ..networks.unit_cell import FLAVORS, UnitCell, fused_tensor
from ..ops import mps as mpslib
from ..ops.contract import execute_plan
from ..ops.mps import MPS
from ..planner.compiler import Plan, compile_plan

MessageDict = Dict[BlockSide, MPS]


# --------------------------- plan caching ---------------------------------


@functools.lru_cache(maxsize=None)
def _graph_for(N: int, D: int, chi_msg: int, sides: Tuple[int, ...]) -> TNGraph:
    return full_graph(N, D, chi_msg, tuple(BlockSide(s) for s in sides))


@functools.lru_cache(maxsize=None)
def to_message_plan(N: int, D: int, chi: int, chi_msg: int, toward: int) -> Plan:
    """Plan for the outgoing message toward side `toward`: contract the block
    + the other 5 incoming messages."""
    sides = tuple(int(s) for s in BlockSide if int(s) != toward)
    graph = _graph_for(N, D, chi_msg, sides)
    plan = compile_plan(graph, BlockSide(toward), chi)
    # final sites: boundary legs of `toward` (plus possibly dim-1 corner ends)
    return plan


@functools.lru_cache(maxsize=None)
def full_scalar_plan(N: int, D: int, chi: int, chi_msg: int, toward: int = int(BlockSide.U)) -> Plan:
    graph = _graph_for(N, D, chi_msg, tuple(int(s) for s in BlockSide))
    return compile_plan(graph, BlockSide(toward), chi)


# --------------------------- tensor binding -------------------------------


def fused_cells(cell) -> Tuple[jnp.ndarray, ...]:
    """Fused double-layer tensors: 3 for a UnitCell, one per site for a
    per-site view (anything exposing `_tensors`)."""
    if hasattr(cell, "_tensors"):
        return tuple(fused_tensor(t) for t in cell._tensors)
    return tuple(fused_tensor(cell[f]) for f in FLAVORS)


def _make_fetch(fused: Optional[Sequence[jnp.ndarray]],
                msgs: Dict[int, Tuple[jnp.ndarray, ...]],
                kets: Optional[Sequence[jnp.ndarray]] = None):
    def fetch(source):
        if source[0] == "lat":
            return fused[source[1] % len(fused)]
        if source[0] == "ket":  # single-layer executor mode
            return kets[source[1] % len(kets)]
        _, side, k = source
        return msgs[side][k]

    return fetch


_RUNNER_CACHE: Dict[int, Callable] = {}


def _jitted_runner(plan: Plan):
    """One jitted executable per Plan object (plans are lru-cached ⇒ their
    identity is stable; Plan itself holds lists so it isn't hashable)."""
    key = id(plan)
    if key not in _RUNNER_CACHE:

        def run(fused, msg_sites):
            fetch = _make_fetch(fused, msg_sites)
            return execute_plan(plan, fetch)

        from ..utils.jaxtools import resilient_jit

        _RUNNER_CACHE[key] = resilient_jit(run)
    return _RUNNER_CACHE[key]


def run_plan(plan: Plan, cell_or_fused, messages: Optional[MessageDict]):
    """Execute `plan` with the given unit cell and messages.

    Returns MPS (with message logscales folded in) or (mantissa, log) for a
    scalar plan.
    """
    if isinstance(cell_or_fused, UnitCell):
        fused = fused_cells(cell_or_fused)
    else:
        fused = tuple(cell_or_fused)
    msg_sites: Dict[int, Tuple[jnp.ndarray, ...]] = {}
    extra_log = 0.0
    used_sides = {s[1] for s in (st.source for st in plan.steps) if s[0] == "msg"}
    if messages:
        for side, m in messages.items():
            if int(side) in used_sides:
                msg_sites[int(side)] = tuple(m.sites)
                extra_log = extra_log + m.logscale
    missing = used_sides - set(msg_sites)
    assert not missing, f"plan needs messages for sides {missing}"

    out = _jitted_runner(plan)(fused, msg_sites)
    if isinstance(out, MPS):
        return MPS(out.sites, out.logscale + extra_log)
    mantissa, log = out
    return mantissa, log + extra_log


# --------------------------- message helpers ------------------------------


def initial_messages(
    N: int, D: int, chi: int, model: str = "uniform", key=None, dtype=jnp.complex128
) -> MessageDict:
    """Fresh incoming messages for all 6 sides, in canonical padded profile.
    (reference: MessageModel init, tensor_networks/mps.py:160)"""
    from ..lattices.kagome import num_message_sites

    n = num_message_sites(N)
    msgs: MessageDict = {}
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 6)
    profile = message_bond_profile(N, D, chi)
    for side, k in zip(BlockSide, keys):
        if model == "uniform":
            m = mpslib.uniform_message(D, n, dtype)
        elif model == "random":
            m = mpslib.random_message(D, n, k, dtype)
        elif model == "uniform-classic":
            m = mpslib.classical_message(D, n, None, dtype)
        elif model == "random-classic":
            m = mpslib.classical_message(D, n, k, dtype)
        else:
            raise ValueError(f"unknown message model {model!r}")
        msgs[side] = mpslib.pad_bonds(m, profile)
    return msgs


def finalize_outgoing(raw: MPS, plan: Plan, graph_boundary_count: int) -> MPS:
    """Convert the raw final frontier of a ToMessage plan into a clean
    message MPS: absorb dim-1 corner end sites, compress is already done."""
    sites = list(raw.sites)
    # leading dim-1-phys sites (corner bonds of adjacent messages)
    while len(sites) > graph_boundary_count:
        if sites[0].shape[1] == 1:
            m = sites[0].reshape(sites[0].shape[0], sites[0].shape[2])
            sites[1] = jnp.einsum("ab,bpc->apc", m, sites[1])
            sites = sites[1:]
        elif sites[-1].shape[1] == 1:
            m = sites[-1].reshape(sites[-1].shape[0], sites[-1].shape[2])
            sites[-2] = jnp.einsum("apb,bc->apc", sites[-2], m)
            sites = sites[:-1]
        else:
            raise AssertionError("unexpected extra non-trivial site in message")
    # end bonds must now be trivial
    assert sites[0].shape[0] == 1 and sites[-1].shape[2] == 1
    return MPS(tuple(sites), raw.logscale)


def message_postprocess(raw: MPS, plan: Plan, N: int, D: int, chi_msg: int) -> MPS:
    """Raw ToMessage frontier → canonical BP message: fold corner ends,
    compress to χ, pad to the canonical profile, drop the scale (messages
    are scale-free). The single shared tail of every outgoing-message path
    (eager, fused/jitted, single-layer)."""
    from ..lattices.kagome import num_message_sites

    out = finalize_outgoing(raw, plan, num_message_sites(N))
    out = mpslib.compress(out, chi_msg)
    out = mpslib.pad_bonds(out, message_bond_profile(N, D, chi_msg))
    return MPS(out.sites, jnp.zeros_like(out.logscale))


def outgoing_message(
    cell_or_fused, messages: MessageDict, N: int, D: int, chi: int, chi_msg: int,
    toward: BlockSide,
) -> MPS:
    """Compute the outgoing message through side `toward` and normalise it
    into canonical padded profile with unit norm (logscale dropped — BP
    messages are scale-free)."""
    plan = to_message_plan(N, D, chi, chi_msg, int(toward))
    raw = run_plan(plan, cell_or_fused, messages)
    assert isinstance(raw, MPS)
    return message_postprocess(raw, plan, N, D, chi_msg)


# ------------------------- single-layer mode -------------------------------
# (reference: bubblecon.py:1855 `swallow_ket_T` — the ket layer is swallowed
# against the ket halves of the frontier's fused D² legs, the bra layer
# contracted after, so the D⁴-leg fused node tensor never materialises and
# the swallow blob peaks at χ²·d·D^4 instead of χ²·D^6. Implemented as an
# executor mode on the SAME double-layer plan: Plan.single_layer=True makes
# lattice steps fetch ("ket", v) and run ops/contract._swallow_ket_blob.)


def single_layer_plan(plan: Plan) -> Plan:
    """The same compiled plan, executed in single-layer mode."""
    import dataclasses

    return dataclasses.replace(plan, single_layer=True)


def outgoing_message_single(
    cell, messages: MessageDict, N: int, D: int, chi: int, chi_msg: int,
    toward: BlockSide,
) -> MPS:
    """Single-layer variant of `outgoing_message`: identical message (same
    steps, swallow-level reordering only), lower peak memory at large D."""
    plan = single_layer_plan(to_message_plan(N, D, chi, chi_msg, int(toward)))
    cells = (
        tuple(cell._tensors) if hasattr(cell, "_tensors")
        else (cell.A, cell.B, cell.C)
    )
    msg_sites = {int(s): tuple(m.sites) for s, m in messages.items()
                 if int(s) != int(toward)}
    raw = execute_plan(plan, _make_fetch(None, msg_sites, kets=cells))
    assert isinstance(raw, MPS)
    return message_postprocess(raw, plan, N, D, chi_msg)
