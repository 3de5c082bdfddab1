"""χ-sharded boundary-MPS contraction: model parallelism for ONE contraction.

The reference's dead MPI block-BP (/root/reference/src/libs/_blockbp/
functions.py:609-747) documents the intent of spreading a single BlockBP
environment computation over workers. The TPU-native realisation is NOT
message passing: the boundary-MPS frontier's bond dimension χ is laid over a
mesh axis with sharding constraints, and GSPMD partitions the swallow
contractions (the χ²·D⁴-scale tensordots that dominate flops and memory at
large D/χ) across devices with XLA-inserted ICI collectives. The small
windowed QR/SVD truncations are gathered — they are the χ³ tail, not the
bulk, and stay latency-bound either way.

Design per the scaling-book recipe: pick a mesh, annotate shardings (here:
frontier-site bond axis 0 over the ``chi`` mesh axis), let XLA insert the
collectives.

Usage:
    mesh = chi_mesh(jax.devices()[:4])
    msg  = outgoing_message_sharded(cell, msgs, N, D, chi, chi_msg,
                                    toward, mesh)
Correctness: identical maths to the unsharded executor (same plan, same
ops); results agree to float roundoff — validated on the virtual CPU mesh
in tests/test_chi_shard.py and by __graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algo import contraction as C
from ..lattices import BlockSide
from ..ops import contract as X
from ..ops.mps import MPS
from ..utils.jaxtools import resilient_jit


def chi_mesh(devices=None, n_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh whose single axis carries the frontier bond dimension."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("chi",))


def site_sharder(mesh: Mesh, axis: str = "chi",
                 min_size: Optional[int] = None) -> Callable:
    """Constraint hook for ops.contract.site_constraint: shard a frontier
    site's LEFT bond (axis 0) over `axis` when it is large enough to split;
    replicate small sites (sharding a dim-8 bond over 8 devices is pure
    collective overhead). The left bond flows freely through the swallow
    tensordot chain (ops/contract.apply_step), so the big blob inherits the
    sharding and its construction is partitioned."""
    n = mesh.shape[axis]
    min_size = min_size if min_size is not None else 2 * n
    sharded = NamedSharding(mesh, P(axis, None, None))
    replicated = NamedSharding(mesh, P(None, None, None))

    def constrain(site: jnp.ndarray) -> jnp.ndarray:
        if site.ndim != 3:
            return site
        spec = sharded if site.shape[0] >= min_size else replicated
        return jax.lax.with_sharding_constraint(site, spec)

    return constrain


_RUNNER_CACHE: Dict[Tuple[int, int], Callable] = {}


def _sharded_runner(plan, mesh: Mesh):
    """Jitted plan executor with the χ-sharding hook active at trace time.
    Cached per (plan, mesh) — separate from the unsharded runner cache."""
    key = (id(plan), id(mesh))
    if key not in _RUNNER_CACHE:
        constrain = site_sharder(mesh)

        def run(fused, msg_sites):
            fetch = C._make_fetch(fused, msg_sites)
            with X.site_constraint(constrain):
                return X.execute_plan(plan, fetch)

        _RUNNER_CACHE[key] = resilient_jit(run)
    return _RUNNER_CACHE[key]


def outgoing_message_sharded(
    cell_or_fused, messages: C.MessageDict, N: int, D: int, chi: int,
    chi_msg: int, toward: BlockSide, mesh: Mesh,
) -> MPS:
    """`algo.contraction.outgoing_message` with the contraction's frontier
    bond χ sharded over `mesh`'s ``chi`` axis. Same plan, same maths."""
    plan = C.to_message_plan(N, D, chi, chi_msg, int(toward))
    if isinstance(cell_or_fused, tuple):
        fused = cell_or_fused
    else:
        fused = C.fused_cells(cell_or_fused)
    msg_sites = {int(s): tuple(m.sites) for s, m in messages.items()
                 if int(s) != int(toward)}
    raw = _sharded_runner(plan, mesh)(fused, msg_sites)
    assert isinstance(raw, MPS)
    extra = sum(m.logscale for s, m in messages.items()
                if int(s) != int(toward))
    raw = MPS(raw.sites, raw.logscale + extra)
    return C.message_postprocess(raw, plan, N, D, chi_msg)


def bp_sweep_sharded(cell_or_fused, messages: C.MessageDict, N: int, D: int,
                     chi: int, chi_msg: int, mesh: Mesh) -> Tuple[C.MessageDict, float]:
    """One synchronous BP sweep with every outgoing-message contraction
    χ-sharded over the mesh. Returns (new messages, mean message distance).
    (reference: belief_propagation.py:164 `_belief_propagation_step`)"""
    from ..ops import mps as mpslib

    new_msgs: C.MessageDict = {}
    for toward in BlockSide:
        out = outgoing_message_sharded(
            cell_or_fused, messages, N, D, chi, chi_msg, toward, mesh)
        # periodic wrap: the outgoing MPS runs along `toward`'s boundary
        # ordering; as the opposite side's incoming message it is traversed
        # the other way (algo/fused.py:195 does the same reverse)
        new_msgs[toward.opposite()] = out.reverse()
    err = float(np.mean([
        float(mpslib.distance(new_msgs[s], messages[s])) for s in BlockSide
    ]))
    return new_msgs, err
