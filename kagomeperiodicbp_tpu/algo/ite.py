"""Full-update imaginary-time evolution: the training loop.

(reference: /root/reference/src/algo/imaginary_time_evolution/main.py:704
`full_ite` and _tn_update.py:165 `ite_update_unit_cell`)

Structure per delta_t (reference semantics):
  segment → [noise? rotation?] → modes × (edge sweep) → measurement
with symmetric 2nd-order Trotter edge ordering (forward + reversed, middle
edge once at 2·dt — main.py:86-96), per-edge BP refresh, energy tracking,
best-state store and error escalation.
"""
from __future__ import annotations

import logging
import pickle
import random
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..enums import UpdateEdge, UpdateMode
from ..utils.jaxtools import to_numpy as _to_numpy
from ..networks.unit_cell import UnitCell
from ..ops import ite_kernels as K
from . import edge_env as E
from .bp import BPConfig, BPStats, robust_belief_propagation
from .contraction import MessageDict
from .measurements import MeasurementsOnUnitCell, measure_energies_and_observables


def default_time_steps(start: float = 1e-2, stop: float = 1e-8, per: int = 100) -> List[float]:
    """Log-spaced δt ladder (reference: run_ite.py:58 / DEFAULT_TIME_STEPS)."""
    steps: List[float] = []
    dt = start
    while dt >= stop * 0.999:
        steps += [dt] * per
        dt /= 10
    return steps


@dataclass
class ITEConfig:
    """(reference: containers/imaginary_time_evolution.py:179 + 157)"""

    hamiltonian: Callable[[], np.ndarray] = None  # type: ignore[assignment]
    time_steps: List[float] = field(default_factory=default_time_steps)
    # orders
    random_edge_order: bool = True
    random_mode_order: bool = True
    symmetric_second_order_trotterization: bool = True
    num_mode_repetitions_per_segment: int = 5  # reference default (iterative_process.py:170)
    num_edge_repetitions_per_mode: int = 6
    # after-update
    normalize_tensors_after_update: bool = True
    # (the reference declares force_hermitian_tensors_after_update=True but
    # never implements it — containers/imaginary_time_evolution.py:191;
    # accepted here for config parity, also a no-op)
    force_hermitian_tensors_after_update: bool = True
    # keep the lowest-energy state at each delta_t block boundary
    # (reference: main.py:658 always_use_lowest_energy_state)
    always_use_lowest_energy_state: bool = False
    # skip to the next delta_t when this many segments fail to improve
    # (reference: check_converges + CONVERGENCE_CHECK_LENGTH=3, main.py:455)
    check_converges: bool = False
    convergence_check_length: int = 3
    # optimisation
    add_gaussian_noise_fraction: Optional[float] = None
    randomly_rotate_unit_cell_between_segments: bool = True  # reference default
    # bp
    bp_every_edge: bool = True
    start_segment_with_new_bp_message: bool = True
    # error escalation (reference: iterative_process config)
    num_errors_per_delta_t_threshold: int = 2
    num_total_errors_threshold: int = 10
    # als
    als_iterations: int = 10
    seed: int = 0


@dataclass
class ITESegmentStats:
    delta_t: float = 0.0
    mean_energy: float = 0.0
    edge_energies: Dict[str, float] = field(default_factory=dict)
    bp_stats: List[BPStats] = field(default_factory=list)
    duration: float = 0.0
    had_error: bool = False


@dataclass
class ITETracker:
    """Bounded history + checkpointing
    (reference: containers/_ite_tracker.py:64)."""

    delta_ts: List[float] = field(default_factory=list)
    energies: List[float] = field(default_factory=list)
    stats: List[ITESegmentStats] = field(default_factory=list)
    best_energy: float = float("inf")
    best_cell: Optional[UnitCell] = None
    error_count: int = 0
    checkpoint_path: Optional[str] = None

    def log_segment(self, dt, cell, measurement, seg_stats):
        self.delta_ts.append(dt)
        self.energies.append(measurement.mean_energy)
        self.stats.append(seg_stats)
        if measurement.mean_energy < self.best_energy:
            self.best_energy = measurement.mean_energy
            self.best_cell = cell
        if self.checkpoint_path:
            self.save(self.checkpoint_path)

    def save(self, path: str):
        data = {
            "delta_ts": self.delta_ts,
            "energies": self.energies,
            "best_energy": self.best_energy,
            "best_cell": {k: _to_numpy(v) for k, v in self.best_cell.items()}
            if self.best_cell is not None
            else None,
        }
        with open(path, "wb") as fh:
            pickle.dump(data, fh)


class ITEError(RuntimeError):
    pass


def _edge_order(config: ITEConfig, dt: float, rng: random.Random) -> List[Tuple[UpdateEdge, float]]:
    """Edge sweep order with symmetric 2nd-order Trotter doubling
    (reference: main.py:74-104)."""
    if config.random_edge_order:
        edges = UpdateEdge.all_in_random_order(config.num_edge_repetitions_per_mode, rng)
    else:
        edges = UpdateEdge.all_options()
    if config.symmetric_second_order_trotterization:
        edges = list(edges) + list(reversed(edges))
        mid = len(edges) // 2 - 1
        edges.pop(mid + 1)
        dts = [2 * dt if i == mid else dt for i in range(len(edges))]
    else:
        dts = [dt] * len(edges)
    return list(zip(edges, dts))


def ite_update_edge(
    cell: UnitCell,
    messages: MessageDict,
    N: int,
    chi: int,
    chi_msg: int,
    edge: UpdateEdge,
    h: np.ndarray,
    dt: float,
    config: ITEConfig,
) -> Tuple[UnitCell, float, dict]:
    """One edge update: env → gate → ALS → write back.
    (reference: _tn_update.py:165)"""
    from . import fused as F

    D = cell.D
    dtype = cell.A.dtype
    h_arr = jnp.asarray(
        np.real(h) if not jnp.issubdtype(dtype, jnp.complexfloating) else h, dtype
    )
    upd = F.edge_update(
        N, D, chi, chi_msg, edge, config.als_iterations,
        config.normalize_tensors_after_update,
    )
    cells = (cell.A, cell.B, cell.C)
    dt_arr = jnp.asarray(dt, jnp.zeros((), dtype).real.dtype)
    new_cells, energy, herm, sum_eig, neg = upd(
        cells, F._msgs_to_sites(messages), h_arr, dt_arr
    )
    energy_f = float(energy)
    health = {
        "hermicity": float(herm),
        "negativity": float(neg),
        "sum_eigenvalues": float(jnp.real(sum_eig)),
    }
    eps = float(jnp.finfo(jnp.zeros((), dtype).real.dtype).eps)
    tol = max(1e-3, 3e4 * eps)
    if health["hermicity"] > tol or abs(health["sum_eigenvalues"] - 1) > tol:
        raise ITEError(f"unhealthy environment after update: {health}")

    cell = UnitCell(new_cells[0], new_cells[1], new_cells[2], rotated=cell.rotated)
    return cell, energy_f, health


def full_ite(
    cell: Optional[UnitCell],
    config: ITEConfig,
    N: int = 2,
    D: int = 3,
    d: int = 2,
    chi: Optional[int] = None,
    bp_config: Optional[BPConfig] = None,
    logger: Optional[logging.Logger] = None,
    tracker: Optional[ITETracker] = None,
    dtype=jnp.complex128,
    measure_every_segment: bool = True,
    save_best_store: bool = False,
    measurement_N: Optional[int] = None,
    measurement_chi_factor: float = 1.0,
    plots=None,
) -> Tuple[float, UnitCell, ITETracker]:
    """The main ITE driver (reference: main.py:704)."""
    log = logger or logging.getLogger("ite")
    rng = random.Random(config.seed)
    if cell is None:
        import jax

        cell = UnitCell.random(d=d, D=D, key=jax.random.PRNGKey(config.seed), dtype=dtype)
    D = cell.D
    chi = chi or 2 * D * D + 10       # reference: global_config.py:43-48
    bp_config = bp_config or BPConfig(trunc_dim=2 * D * D, dtype=dtype)
    tracker = tracker or ITETracker()
    h = config.hamiltonian()

    messages: Optional[MessageDict] = None
    errors_this_dt = 0
    last_dt = None
    block_best: Tuple[float, Optional[UnitCell]] = (float("inf"), None)
    no_improve = 0
    skip_until_new_dt = False

    for step_idx, dt in enumerate(config.time_steps):
        if dt != last_dt:
            errors_this_dt = 0
            last_dt = dt
            if config.always_use_lowest_energy_state and block_best[1] is not None:
                cell = block_best[1]
            block_best = (float("inf"), None)
            no_improve = 0
            skip_until_new_dt = False
        if skip_until_new_dt:
            continue
        t0 = time.time()
        seg = ITESegmentStats(delta_t=dt)
        try:
            if config.start_segment_with_new_bp_message:
                messages = None
            if config.add_gaussian_noise_fraction:
                cell = cell.add_noise(config.add_gaussian_noise_fraction * dt)
            if config.randomly_rotate_unit_cell_between_segments and rng.random() < 0.5:
                cell = cell.rotate_ccw()

            for _ in range(config.num_mode_repetitions_per_segment):
                for edge, dt_edge in _edge_order(config, dt, rng):
                    if config.bp_every_edge or messages is None:
                        messages, bst = robust_belief_propagation(cell, messages, bp_config, N)
                        seg.bp_stats.append(bst)
                    cell, energy, _ = ite_update_edge(
                        cell, messages, N, chi, bp_config.trunc_dim, edge, h, dt_edge, config
                    )
                    seg.edge_energies[str(edge)] = energy

            if measure_every_segment:
                # measurement-time hardening: larger block + wider chi
                # (reference: change_config_for_measurements_func,
                # run_ite.py:49-55 -> main.py:133-151)
                import dataclasses as _dc

                n_m = measurement_N or N
                bp_m = _dc.replace(
                    bp_config,
                    trunc_dim=int(bp_config.trunc_dim * measurement_chi_factor),
                )
                chi_m = int(chi * measurement_chi_factor)
                cell_m = cell.force_zero_rotation()
                messages_m, bst = robust_belief_propagation(cell_m, None, bp_m, n_m)
                meas = measure_energies_and_observables(
                    cell_m, messages_m, n_m, chi_m, bp_m.trunc_dim, h
                )
                seg.mean_energy = meas.mean_energy
                if meas.mean_energy < block_best[0]:
                    block_best = (meas.mean_energy, cell_m)
                    no_improve = 0
                else:
                    no_improve += 1
                    if config.check_converges and no_improve >= config.convergence_check_length:
                        skip_until_new_dt = True
                tracker.log_segment(dt, cell_m, meas, seg)
                if plots is not None:
                    plots.update(tracker)
                if save_best_store:
                    from ..utils.best_store import save_if_best

                    save_if_best(cell_m, meas.mean_energy, D)
                log.info(
                    "dt=%.2e  step=%d  energy/site=%.10f  best=%.10f",
                    dt, step_idx, meas.mean_energy, tracker.best_energy,
                )
        except ITEError as exc:
            seg.had_error = True
            errors_this_dt += 1
            tracker.error_count += 1
            log.warning("segment error at dt=%.2e: %s", dt, exc)
            if tracker.error_count >= config.num_total_errors_threshold:
                raise ITEError("too many ITE errors — aborting") from exc
            if errors_this_dt >= config.num_errors_per_delta_t_threshold:
                continue  # effectively skip ahead within this dt
        seg.duration = time.time() - t0

    final_cell = tracker.best_cell if tracker.best_cell is not None else cell
    return tracker.best_energy, final_cell, tracker
