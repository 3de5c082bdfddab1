"""Block Belief Propagation: iterate the 6 boundary-MPS messages of the
hexagonal block to a fixed point.

Re-design of the reference's `belief_propagation` /
`robust_belief_propagation` (/root/reference/src/algo/belief_propagation.py:
192,285). Differences by design:

* messages live in a canonical padded bond profile → every BP iteration is
  the same 6 static XLA programs (no shape churn);
* the 6 outgoing messages are computed synchronously from the current
  messages (same as the reference's `_out_going_messages`), and the wrap is
  ``in[S.opposite()] = reverse(out[S])`` — the periodic identification of
  boundary edge k of side S with edge (n−1−k) of the opposite side
  (reference: kagome.py:388-399 periodic wiring).
"""
from __future__ import annotations

import dataclasses
import logging
import math
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

try:  # backend/runtime failures (remote-compiler poisoning, OOM, tunnel)
    from jax.errors import JaxRuntimeError as _JaxError
except ImportError:  # older jax
    from jaxlib.xla_extension import XlaRuntimeError as _JaxError

from ..utils.jaxtools import TransferTimeout, host_float

# hung device→host waits are the same weather class as runtime UNIMPLEMENTED
_BackendError = (_JaxError, TransferTimeout)

from ..lattices import BlockSide
from ..networks.graph import message_bond_profile
from ..networks.unit_cell import UnitCell
from ..ops import mps as mpslib
from ..ops.mps import MPS
from . import contraction as C

MessageDict = Dict[BlockSide, MPS]


@dataclass
class BPConfig:
    """(reference: containers/belief_propagation.py:30-56)"""

    trunc_dim: int = 9                  # χ of the messages
    bubble_trunc_dim: Optional[int] = None  # χ inside the contraction (default: trunc_dim)
    max_iterations: int = 50
    msg_diff_terminate: float = 1e-10
    msg_diff_good_enough: float = 1e-5
    allowed_retries: int = 2
    # hard ceiling on the message χ that retry escalation and downstream
    # config hardening may reach (None = 4× the trunc_dim at robust-BP
    # entry). Without a ceiling, a BP whose error floors just above
    # `good_enough` (e.g. the complex64 precision floor) escalates ×1.5 per
    # retry AND per edge update via `_harden_bp_config_if_struggled`,
    # compounding across the ~55 edge updates of an ITE segment into
    # χ ~ thousands and hours-long XLA executions (observed wedging a D=2
    # run for 2 h). The reference has no cap because its float64 BP rarely
    # fails at a converged state; a dtype-aware implementation needs one.
    trunc_dim_cap: Optional[int] = None
    damping: Optional[float] = None     # fraction of the OLD message kept
    hermitize_when_finished: bool = True
    init_model: str = "uniform"         # 'uniform' | 'random'
    seed: int = 0
    dtype: object = None                # default from unit cell
    # one single-dispatch program for all 6 messages (algo/batched.py) vs
    # six per-side programs (algo/fused.py). None = auto: batched everywhere
    # except the experimental axon TPU backend, whose runtime reliably
    # executes per-side-sized programs but produces poisoned outputs for the
    # 6× larger batched program (measured: per-side 582 sweeps/s on chip).
    batched: Optional[bool] = None
    # single-layer ket swallowing (reference bubblecon.py:1855): peak swallow
    # memory χ²·d·D⁴ instead of χ²·D⁶. None = auto: on for D ≥ 6 (where the
    # fused D⁴-leg tensors start to dominate memory), off below.
    single_layer: Optional[bool] = None

    @property
    def chi_bubble(self) -> int:
        return self.bubble_trunc_dim or self.trunc_dim

    def for_measurements(self, chi_factor: float = 2.0) -> "BPConfig":
        """The measurement-time hardening of a BP config: wider message χ,
        half the termination threshold, one extra retry.  The single source
        of truth for the transform — `full_ite`'s measurement pass and
        `Config.for_measurements` both call it (reference:
        run_ite.py:49-55 `change_config_for_measurements_func` →
        main.py:133-151)."""
        return dataclasses.replace(
            self,
            trunc_dim=int(self.trunc_dim * chi_factor),
            msg_diff_terminate=self.msg_diff_terminate / 2,
            allowed_retries=self.allowed_retries + 1,
            trunc_dim_cap=(
                None if self.trunc_dim_cap is None
                else int(self.trunc_dim_cap * chi_factor)
            ),
        )


@dataclass
class BPStats:
    iterations: int = 0
    final_error: float = float("inf")
    success: bool = False
    attempts: int = 1
    final_config: Optional[BPConfig] = None
    duration: float = 0.0
    error_history: list = field(default_factory=list)


def hermitize_message(m: MPS, D: int, chi: int) -> MPS:
    """Project the message (an operator-valued boundary MPS with fused D²
    phys legs) onto its Hermitian part: ½(M + M†), where M† is the sitewise
    conjugate with ket-bra swap. (reference: libs/ITE.py:116)"""
    sites_dag = []
    for s in m.sites:
        l, p, r = s.shape
        t = s.reshape(l, D, D, r)
        t = jnp.conj(jnp.transpose(t, (0, 2, 1, 3))).reshape(l, p, r)
        sites_dag.append(t)
    m_dag = MPS(tuple(sites_dag), m.logscale)
    out = mpslib.add(m, m_dag, 0.5, 0.5)
    out = mpslib.compress(out, chi)
    out = mpslib.pad_bonds(out, _profile_of(m, chi, D))
    return MPS(out.sites, jnp.zeros_like(out.logscale))


def _profile_of(m: MPS, chi: int, D: int) -> list:
    n = m.n
    p = D * D
    return [min(chi, p ** (k + 1), p ** (n - 1 - k)) for k in range(n - 1)]


def belief_propagation(
    cell: UnitCell,
    messages: Optional[MessageDict],
    config: BPConfig,
    N: int,
) -> Tuple[MessageDict, BPStats]:
    """Iterate to the message fixed point; keep the minimum-error messages.
    (reference: belief_propagation.py:192)"""
    t0 = time.time()
    D = cell.D
    chi_msg = config.trunc_dim
    chi = config.chi_bubble
    dtype = config.dtype or cell.A.dtype

    # clamp convergence thresholds to the working precision: the reference's
    # 1e-10 default assumes float64; in float32/complex64 the message distance
    # floors at ~30·eps, so an unclamped threshold would never terminate and
    # the robust wrapper would escalate χ forever.
    eps = float(jnp.finfo(jnp.zeros((), dtype).real.dtype).eps)
    terminate = max(config.msg_diff_terminate, 30 * eps)
    good_enough = max(config.msg_diff_good_enough, 300 * eps)

    if messages is None:
        messages = C.initial_messages(
            N, D, chi_msg, model=config.init_model,
            key=jax.random.PRNGKey(config.seed), dtype=dtype,
        )

    from . import fused as F

    stats = BPStats(final_config=config)
    from . import batched as B

    single = config.single_layer
    if single is None:
        # auto-on at large D, but never override an explicit batched=True
        single = D >= 6 and config.batched is not True
    use_batched = config.batched
    if use_batched is None:
        use_batched = not B._on_axon() and not single
    # Environment overrides for program-granularity triage (the XLA:CPU
    # compiler walls on the 6×-larger batched program at D≥5 — observed
    # 90+ min jit_impl compiles; per-side and single-layer programs are the
    # same math in smaller compilation units).  Only applied where the
    # config left the choice to auto (None), so tests pinning explicit
    # modes stay deterministic.
    env_single = os.environ.get("KPBP_SINGLE_LAYER")
    if config.single_layer is None and env_single in ("0", "1"):
        single = env_single == "1"
    env_batched = os.environ.get("KPBP_BP_BATCHED")
    if config.batched is None and env_batched in ("0", "1"):
        use_batched = env_batched == "1" and not single
    if single:
        # single-layer swallowing consumes the raw ket tensors
        fused = tuple(cell._tensors) if hasattr(cell, "_tensors") else (
            cell.A, cell.B, cell.C
        )
        use_batched = False
        step_fn = F.bp_iteration(N, D, chi, chi_msg, config.damping, single=True)
    elif use_batched:
        fused = C.fused_cells(cell)
        step_fn = B.bp_iteration_batched(N, D, chi, chi_msg, config.damping)
    else:
        fused = C.fused_cells(cell)
        step_fn = F.bp_iteration(N, D, chi, chi_msg, config.damping)
    msg_sites = F._msgs_to_sites(messages)
    best_err, best_sites = float("inf"), msg_sites
    prev_err = float("inf")
    increases = 0

    for it in range(config.max_iterations):
        prev_sites = msg_sites
        try:
            msg_sites, err_arr = step_fn(fused, prev_sites)
            err = host_float(err_arr)
        except _BackendError as exc:
            if not use_batched:
                raise
            # batched program failed on this backend (a known axon miscompile
            # mode) — fall back to the six per-side programs and redo the
            # iteration from the pre-step messages (the failed step's outputs
            # may be poisoned). Only backend/runtime errors are caught: a
            # genuine bug in the batched path must surface, not be masked.
            logging.getLogger("bp").warning(
                "batched BP program failed (%s) — falling back to per-side programs",
                repr(exc)[:120])
            use_batched = False
            step_fn = F.bp_iteration(N, D, chi, chi_msg, config.damping)
            msg_sites, err_arr = step_fn(fused, prev_sites)
            err = host_float(err_arr)
        stats.error_history.append(err)
        if err < best_err:
            best_err, best_sites = err, msg_sites
        stats.iterations = it + 1
        if err < terminate:
            break
        # failure heuristic: diverging error several times in a row
        # (reference: times_to_deem_failure_when_diff_increases, :261)
        increases = increases + 1 if err > prev_err else 0
        prev_err = err
        if increases >= 4 and best_err < good_enough:
            break

    stats.final_error = best_err
    stats.success = best_err < good_enough

    if config.hermitize_when_finished:
        best_sites = F.hermitize_all(N, D, chi_msg)(best_sites)

    messages = F._sites_to_msgs(best_sites)
    stats.duration = time.time() - t0
    return messages, stats


def robust_belief_propagation(
    cell: UnitCell,
    messages: Optional[MessageDict],
    config: BPConfig,
    N: int,
) -> Tuple[MessageDict, BPStats]:
    """Retry loop with χ escalation ×1.5 and fresh random messages on failure
    (reference: belief_propagation.py:284-332), returning the BEST attempt's
    messages on overall failure exactly as the reference's min_error /
    min_messages tracking does (belief_propagation.py:319-332). Deviations
    from the reference, both dtype-safety measures:

    * escalation respects ``config.trunc_dim_cap`` (default 4× the entry
      trunc_dim);
    * it stops early when a retry fails to improve the best error by ≥30% —
      a plateau means the error is precision-limited (the float32 distance
      floor), not truncation-limited, so more χ only burns compile/execute
      time.
    """
    cap = config.trunc_dim_cap or 4 * config.trunc_dim
    cfg = config
    best: Optional[Tuple[float, MessageDict, BPStats]] = None
    for attempt in range(config.allowed_retries + 1):
        msgs_in = messages if attempt == 0 else None
        out, stats = belief_propagation(cell, msgs_in, cfg, N)
        stats.attempts = attempt + 1
        stats.final_config = cfg
        if stats.success:
            return out, stats
        # NaN-safe ordering: a NaN final_error must never be pinned as
        # "best" (NaN comparisons are always False, so `error < best[0]`
        # would otherwise never replace it) and must never trigger the
        # plateau stop.
        err_is_nan = math.isnan(stats.final_error)
        plateaued = (
            best is not None
            and not err_is_nan
            and stats.final_error >= 0.7 * best[0]
        )
        if best is None or math.isnan(best[0]) or (
            not err_is_nan and stats.final_error < best[0]
        ):
            best = (stats.final_error, out, stats)
        if plateaued or cfg.trunc_dim >= cap:
            break
        cfg = dataclasses.replace(
            cfg,
            trunc_dim=min(cap, int(cfg.trunc_dim * 1.5) + 1),
            bubble_trunc_dim=min(
                int(cap * 1.33) + 1, int(cfg.chi_bubble * 1.5) + 1
            ),
            max_iterations=cfg.max_iterations + 11,
            init_model="random",
            seed=cfg.seed + 1,
        )
    assert best is not None
    _, out, stats = best
    return out, stats
