"""Batched BP: all 6 outgoing messages in ONE dispatched program.

The Kagome block is invariant under 120° rotation about its centre (the
rotation maps upper triangles to upper triangles, cycling the unit-cell
flavors A→B→C — the same symmetry the reference's ``UnitCell.rotate`` uses,
/root/reference/src/unit_cell/definition.py:210-272). Hence the 6 block
sides fall into two symmetry classes, {U, DL, DR} and {D, UR, UL}, and

    out_msg(ψ, toward=R·s) = out_msg(R⁻¹ψ, toward=s)   with messages
    relabeled σ → R·σ,     where R = rotate 120° ccw

holds *exactly* (verified bit-identical at N=2, D=2 against the direct
per-side computation). One contraction plan per class therefore serves all
six sides: stack the three rotated copies of the network along a leading
batch axis and ``vmap`` the plan executor over it.

This replaces the reference's 6-way process parallelism
(src/utils/parallels.py:88-109, used at belief_propagation.py:150) with the
TPU-native form: a single XLA program whose leading batch axis can be
sharded over a device mesh (see parallel/multichip.py).

Damping is *data* here (a traced scalar), so changing the damping strength
never recompiles — unlike round 1's per-side programs that baked it into
the signature.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..lattices import BlockSide
from ..networks.graph import message_bond_profile
from ..networks.unit_cell import _ROT_PERM, _ROT_SRC, FLAVORS
from ..ops import mps as mpslib
from ..ops.contract import execute_plan
from ..ops.mps import MPS
from ..utils.jaxtools import resilient_jit
from . import contraction as C

MsgSites = Dict[int, Tuple[jnp.ndarray, ...]]

# the two class representatives and the rotation count of each side:
# side = CLASS_BASE.rotate_ccw(2*b)
CLASS_SIDES = {
    int(BlockSide.U): [int(BlockSide.U.rotate_ccw(2 * b)) for b in range(3)],
    int(BlockSide.D): [int(BlockSide.D.rotate_ccw(2 * b)) for b in range(3)],
}

_FIDX = {f: i for i, f in enumerate(FLAVORS)}


def _rotate_fused_once(fused: Tuple[jnp.ndarray, ...]) -> Tuple[jnp.ndarray, ...]:
    """Fused tensors of the 120°-ccw-rotated state (pure leg transposes;
    fusing commutes with virtual-leg permutation)."""
    out = []
    for f in FLAVORS:
        src = fused[_FIDX[_ROT_SRC[f]]]
        out.append(jnp.transpose(src, _ROT_PERM[f]))
    return tuple(out)


def _rotated_fused_stacks(fused: Tuple[jnp.ndarray, ...]):
    """[ψ, R⁻¹ψ, R⁻²ψ] as one stacked array per flavor: [3, p, p, p, p].

    R⁻¹ = rotate ccw twice (rotations form Z₃).
    """
    f0 = fused
    f2 = _rotate_fused_once(fused)            # R¹ψ  (= R⁻²ψ)
    f1 = _rotate_fused_once(f2)               # R²ψ  (= R⁻¹ψ)
    per_b = [f0, f1, f2]
    return tuple(
        jnp.stack([per_b[b][i] for b in range(3)]) for i in range(3)
    )


def _stacked_msg_sites(msg_sites: MsgSites, base: int) -> MsgSites:
    """Per plan slot σ (≠ base), stack messages of sides σ·R^b over b:
    the rotated copy b of the network carries M[σ.rotate_ccw(2b)] at σ."""
    out: MsgSites = {}
    for sigma in BlockSide:
        if int(sigma) == base:
            continue
        out[int(sigma)] = tuple(
            jnp.stack([
                msg_sites[int(sigma.rotate_ccw(2 * b))][k] for b in range(3)
            ])
            for k in range(len(msg_sites[int(sigma)]))
        )
    return out


def _class_outgoing(fused_stack, msg_stack: MsgSites, N, D, chi, chi_msg,
                    base: int, unroll: bool = False):
    """Outgoing-message computation for one symmetry class over the stacked
    3-rotation batch. Returns a tuple of stacked site arrays [3, Dl, p, Dr].

    `unroll=True` traces the three rotations as three inline copies instead
    of one vmapped body — same single dispatch, but only *unbatched* linalg
    ops appear in the program (the experimental axon TPU runtime executes
    those reliably; batched complex QR/SVD produce poisoned outputs there).
    """
    from ..lattices.kagome import num_message_sites

    plan = C.to_message_plan(N, D, chi, chi_msg, base)

    def one(fused3, msgs):
        def fetch(source):
            if source[0] == "lat":
                return fused3[source[1] % 3]
            _, side, k = source
            return msgs[side][k]

        out = execute_plan(plan, fetch)
        out = C.finalize_outgoing(out, plan, num_message_sites(N))
        out = mpslib.compress(out, chi_msg)
        out = mpslib.pad_bonds(out, message_bond_profile(N, D, chi_msg))
        return tuple(out.sites)

    if unroll:
        per_b = [
            one(
                tuple(f[b] for f in fused_stack),
                {s: tuple(x[b] for x in v) for s, v in msg_stack.items()},
            )
            for b in range(3)
        ]
        return tuple(
            jnp.stack([per_b[b][k] for b in range(3)]) for k in range(len(per_b[0]))
        )
    return jax.vmap(one)(fused_stack, msg_stack)


def _zero_log(sites) -> MPS:
    rd = jnp.zeros((), sites[0].dtype).real.dtype
    return MPS(tuple(sites), jnp.zeros((), rd))


def bp_sweep_impl(N: int, D: int, chi: int, chi_msg: int, damped: bool,
                  sharder=None, unroll: bool = False):
    """Traced body of one synchronous BP sweep (un-jitted — vmappable over a
    chain axis; see parallel/multichip.py).

    (fused3, msg_sites, damping) → (new_msg_sites, mean_distance)

    * fused3 — tuple of the 3 fused unit-cell tensors;
    * msg_sites — dict side-int → tuple of message site arrays;
    * damping — traced scalar in [0, 1): fraction of the old message kept
      (ignored when `damped` is False — pass 0.0).
    * sharder — optional hook (stacked_tree → stacked_tree) applied to the
      per-class batch stacks, e.g. a with_sharding_constraint that lays the
      3-batch over a mesh axis (parallel/multichip.py).
    """

    def impl(fused3, msg_sites: MsgSites, damping):
        fstacks = _rotated_fused_stacks(fused3)
        if sharder is not None:
            fstacks = sharder(fstacks)
        out_sides = {}
        for base, sides in CLASS_SIDES.items():
            mstack = _stacked_msg_sites(msg_sites, base)
            if sharder is not None:
                mstack = sharder(mstack)
            stacked = _class_outgoing(fstacks, mstack, N, D, chi, chi_msg, base,
                                      unroll=unroll)
            for b, side in enumerate(sides):
                out_sides[side] = tuple(s[b] for s in stacked)

        new: MsgSites = {}
        dists = []
        for side in BlockSide:
            out = _zero_log(out_sides[int(side)])
            wrapped = out.reverse()
            tgt = int(side.opposite())
            old = _zero_log(msg_sites[tgt])
            dists.append(jnp.real(mpslib.distance(old, wrapped)))
            if damped:
                d = damping.astype(old.logscale.dtype)
                mixed = mpslib.add(wrapped, old, 1.0 - d, d)
                mixed = mpslib.compress(mixed, chi_msg)
                mixed = mpslib.pad_bonds(mixed, message_bond_profile(N, D, chi_msg))
                wrapped = _zero_log(mixed.sites)
            new[tgt] = tuple(wrapped.sites)
        err = jnp.mean(jnp.stack(dists))
        return new, err

    return impl


def _on_axon() -> bool:
    """True when the experimental axon TPU backend is active.

    NOTE the devices themselves report platform 'tpu' (round-3 finding:
    ``jax.devices()[0].platform == 'tpu'``, device_kind 'TPU v5 lite', while
    ``jax.config.jax_platforms == 'axon,...'``) — checking the device
    platform string alone NEVER detects axon, which silently disabled every
    axon workaround on real hardware in round 2."""
    import os

    import jax

    plats = "%s,%s" % (getattr(jax.config, "jax_platforms", "") or "",
                       os.environ.get("JAX_PLATFORMS", ""))
    if "axon" not in plats:
        return False
    try:
        return jax.devices()[0].platform in ("axon", "tpu")
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def bp_step_program(N: int, D: int, chi: int, chi_msg: int, damped: bool,
                    sharder=None, unroll: Optional[bool] = None):
    """jitted single-chain BP sweep (see bp_sweep_impl for the contract).
    `unroll=None` → auto: unrolled on the axon TPU backend, vmapped elsewhere."""
    if unroll is None:
        unroll = _on_axon()
    return resilient_jit(bp_sweep_impl(N, D, chi, chi_msg, damped, sharder,
                                       unroll=unroll))


def bp_iteration_batched(N: int, D: int, chi: int, chi_msg: int,
                         damping: Optional[float]):
    """Drop-in replacement for fused.bp_iteration with a single dispatch per
    sweep. `damping` may be changed per call without recompiling."""
    prog = bp_step_program(N, D, chi, chi_msg, damped=bool(damping))

    def run(fused, msg_sites: MsgSites, damping_value: Optional[float] = None):
        d = damping_value if damping_value is not None else (damping or 0.0)
        rd = jnp.zeros((), fused[0].dtype).real.dtype
        return prog(tuple(fused), msg_sites, jnp.asarray(d, rd))

    return run
