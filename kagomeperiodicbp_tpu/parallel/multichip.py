"""Multi-chip execution: shard BP sweeps + measurement over a device mesh.

TPU-native replacement for the reference's two distribution layers:

* the 6-way in-process message parallelism
  (/root/reference/src/utils/parallels.py:88-109, used at
  src/algo/belief_propagation.py:150) becomes a **mesh `side` axis**: the
  three 120°-rotated copies of the network (algo/batched.py) are laid over
  3 devices with a sharding constraint, so each device contracts two of the
  six outgoing messages (one per symmetry class) and the wrap/distance step
  is an ICI collective inserted by GSPMD;
* the HTCondor parameter sweep (/root/reference/scripts/condor/) becomes a
  **mesh `dp` axis**: independent (seed, noise, …) chains are a leading
  batch dimension sharded across devices, with scalar reductions (mean
  energy) as cross-device psums.

Everything here is a single jitted program per (mesh, sizes): XLA/GSPMD
inserts the collectives; no host-side message passing exists.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algo import batched as B
from ..enums import UpdateEdge
from ..lattices import BlockSide
from ..networks.unit_cell import fused_tensor
from ..ops import ite_kernels as K
from ..utils.jaxtools import resilient_jit

MsgSites = Dict[int, Tuple[jnp.ndarray, ...]]


def make_mesh(devices=None, n_devices: Optional[int] = None) -> Mesh:
    """Factor the devices into a (dp, side) mesh. The `side` axis carries the
    3-way rotation batch of the BP sweep.  When 3 ∤ n, the largest
    3-divisible subset of the devices is used (side=3 beats a few extra dp
    chains: the rotation batch is the latency-critical axis) — pure
    data-parallel only when fewer than 3 devices exist."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n >= 3:
        n = 3 * (n // 3)
        devices, side = devices[:n], 3
    else:
        side = 1
    return Mesh(np.array(devices).reshape(n // side, side), ("dp", "side"))


_SHARDER_CACHE: Dict[int, object] = {}


def side_sharder(mesh: Mesh):
    """Sharding hook for algo.batched: lay the leading 3-rotation axis over
    the mesh's `side` axis (stable identity per mesh, so jitted programs
    cache)."""
    key = id(mesh)
    if key not in _SHARDER_CACHE:
        if "side" in mesh.axis_names and mesh.shape["side"] == 3:
            spec = NamedSharding(mesh, P("side"))

            def sharder(tree):
                return jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, spec), tree
                )
        else:
            sharder = None
        _SHARDER_CACHE[key] = sharder
    return _SHARDER_CACHE[key]


def sharded_bp_step(N: int, D: int, chi: int, chi_msg: int, mesh: Mesh,
                    damped: bool = False):
    """Single-chain BP sweep with the rotation batch sharded over `side`.
    Same contract as algo.batched.bp_step_program."""
    return B.bp_step_program(N, D, chi, chi_msg, damped, sharder=side_sharder(mesh))


def multichain_bp_energy_step(N: int, D: int, chi: int, chi_msg: int,
                              mesh: Mesh, edge: UpdateEdge):
    """jitted (cells_batch, msg_sites_batch, h) →
    (new_msg_sites_batch, err[n], energy[n], mean_energy).

    * cells_batch — (A, B, C) arrays of shape [n_chains, d, D, D, D, D],
      sharded over `dp`;
    * msg_sites_batch — dict side→tuple of [n_chains, …] site arrays;
    * h — 2-site Hamiltonian [d,d,d,d] (replicated).

    Each chain runs one synchronous BP sweep (rotation batch over `side`)
    and measures the edge energy from the updated messages; the mean energy
    is a cross-mesh reduction.  (The reference's per-worker unit: one BP
    step + measurement, scripts/condor/worker.py:38.)
    """
    from ..algo import fused as F

    sharder = side_sharder(mesh)
    dp_spec = NamedSharding(mesh, P("dp"))
    sweep = B.bp_sweep_impl(N, D, chi, chi_msg, damped=False, sharder=sharder)

    def one_chain(a, b, c, msg_sites, h):
        fused3 = (fused_tensor(a), fused_tensor(b), fused_tensor(c))
        rd = jnp.zeros((), fused3[0].dtype).real.dtype
        new_msgs, err = sweep(fused3, msg_sites, jnp.zeros((), rd))
        t1, t2, env, _ = F._edge_env_traced((a, b, c), new_msgs, N, chi, chi_msg, edge)
        rho = K.rho_ij(t1, t2, env)
        energy = jnp.real(jnp.einsum("iIjJ,iIjJ->", rho, h))
        return new_msgs, err, energy

    def impl(cells_batch, msg_sites_batch, h):
        cells_batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, dp_spec), cells_batch
        )
        new_msgs, errs, energies = jax.vmap(
            lambda a, b, c, ms: one_chain(a, b, c, ms, h)
        )(cells_batch[0], cells_batch[1], cells_batch[2], msg_sites_batch)
        return new_msgs, errs, energies, jnp.mean(energies)

    return resilient_jit(impl)


def multichain_ite_step(N: int, D: int, chi: int, chi_msg: int,
                        mesh: Mesh, edge: UpdateEdge, als_iters: int = 10):
    """jitted (cells_batch, msg_sites_batch, h, dt) →
    (new_cells_batch, new_msg_sites_batch, err[n], energy[n], mean_energy).

    The full production work unit per chain, sharded over the (dp, side)
    mesh: one synchronous BP sweep (rotation batch on `side`), then one ITE
    edge update — Trotter gate + ALS bond truncation + write-back — and the
    post-update edge energy.  This is the reference's ITE inner loop
    (src/algo/imaginary_time_evolution/_tn_update.py:165) as a single SPMD
    program per (mesh, sizes): GSPMD inserts the ICI collectives, no
    host-side message passing exists.
    """
    from ..algo import edge_env as E
    from ..algo import fused as F

    sharder = side_sharder(mesh)
    dp_spec = NamedSharding(mesh, P("dp"))
    sweep = B.bp_sweep_impl(N, D, chi, chi_msg, damped=False, sharder=sharder)

    # static write-back permutations (host-side, shape-only)
    from ..lattices.kagome import KagomeBlock

    block = KagomeBlock.build(N)
    n1, n2 = E.edge_pair(block, edge)
    dummy = [np.zeros((2, D, D, D, D))] * 3
    _, p1 = E._canonical_ket(lambda v: dummy[v % 3], block, n1, edge.direction())
    _, p2 = E._canonical_ket(lambda v: dummy[v % 3], block, n2,
                             edge.direction().opposite())

    def one_chain(a, b, c, msg_sites, h, dt):
        cells = (a, b, c)
        fused3 = tuple(fused_tensor(t) for t in cells)
        rd = jnp.zeros((), fused3[0].dtype).real.dtype
        new_msgs, err = sweep(fused3, msg_sites, jnp.zeros((), rd))
        t1, t2, env, _ = F._edge_env_traced(cells, new_msgs, N, chi, chi_msg, edge)
        g = K.gate_from_hamiltonian(h, dt)
        t1n, t2n, _w = K.apply_gate(g, D, t1, t2, env, als_iters=als_iters)
        rho = K.rho_ij(t1n, t2n, env)
        energy = jnp.real(jnp.einsum("iIjJ,iIjJ->", rho, h))
        t1n = t1n / jnp.linalg.norm(t1n)
        t2n = t2n / jnp.linalg.norm(t2n)
        new_cells = list(cells)
        new_cells[int(edge.first)] = F._unpermute(t1n, p1)
        new_cells[int(edge.second)] = F._unpermute(t2n, p2)
        return tuple(new_cells), new_msgs, err, energy

    def impl(cells_batch, msg_sites_batch, h, dt):
        cells_batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, dp_spec), cells_batch
        )
        new_cells, new_msgs, errs, energies = jax.vmap(
            lambda a, b, c, ms: one_chain(a, b, c, ms, h, dt)
        )(cells_batch[0], cells_batch[1], cells_batch[2], msg_sites_batch)
        new_cells = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, dp_spec), new_cells
        )
        return new_cells, new_msgs, errs, energies, jnp.mean(energies)

    return resilient_jit(impl)
