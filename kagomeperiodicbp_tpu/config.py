"""The runtime configuration tree.

(reference: /root/reference/src/containers/global_config.py:28 `Config` with
dimension-derived defaults, escalation, and the measurement-time transform
hook; plus sizes_and_dimensions.py TNDimensions)
"""
from __future__ import annotations

import copy
import dataclasses
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax.numpy as jnp

from .algo.bp import BPConfig
from .algo.ite import ITEConfig


@dataclass
class TNDimensions:
    """(reference: containers/sizes_and_dimensions.py:6)"""

    physical_dim: int = 2
    virtual_dim: int = 3
    big_lattice_size: int = 2


@dataclass
class ContractionConfig:
    """(reference: containers/contractions.py:9-34)"""

    trunc_dim: Optional[int] = None       # χ of bubble contractions; derived if None
    trunc_dim_factor: float = 1.0


@dataclass
class VisualsConfig:
    verbose: bool = True
    live_plots: bool = False
    # False / True / per-level dict — materialised by `progress_hierarchy()`
    # (reference: containers/visuals.py:31 ProgressBarsConfig)
    progress_bars: object = False

    def progress_hierarchy(self):
        from .utils.progress import ProgressHierarchy

        return ProgressHierarchy(self.progress_bars)


@dataclass
class MonitoringConfig:
    monitor_cpu: bool = False
    monitor_ram: bool = False


@dataclass
class IOConfig:
    data_dir: str = "data"
    logs_dir: str = "logs"


@dataclass
class Config:
    dims: TNDimensions = field(default_factory=TNDimensions)
    bp: BPConfig = field(default_factory=BPConfig)
    ite: ITEConfig = field(default_factory=ITEConfig)
    contraction: ContractionConfig = field(default_factory=ContractionConfig)
    visuals: VisualsConfig = field(default_factory=VisualsConfig)
    monitoring: MonitoringConfig = field(default_factory=MonitoringConfig)
    io: IOConfig = field(default_factory=IOConfig)
    dtype: object = jnp.complex128
    # measurement-time transform hook (reference: run_ite.py:49-55 →
    # main.py:133-151: N+1, χ×2, tighter BP for measurements)
    change_config_for_measurements_func: Optional[Callable[["Config"], "Config"]] = None

    @property
    def chi(self) -> int:
        """Bubble χ = 2D²·factor + 10 (reference: global_config.py:43-48)."""
        if self.contraction.trunc_dim is not None:
            return self.contraction.trunc_dim
        D = self.dims.virtual_dim
        return int(2 * D * D * self.contraction.trunc_dim_factor) + 10

    @property
    def chi_bp(self) -> int:
        return self.bp.trunc_dim

    @staticmethod
    def derive_from_dimensions(D: int, N: int = 2, d: int = 2) -> "Config":
        cfg = Config(dims=TNDimensions(physical_dim=d, virtual_dim=D, big_lattice_size=N))
        cfg.bp = BPConfig(trunc_dim=2 * D * D)
        return cfg

    def copy(self) -> "Config":
        return copy.deepcopy(self)

    def strengthen(self, factor: float = 1.5) -> "Config":
        """χ escalation (reference: global_config.py:92).  The same
        escalation applied mid-run by `robust_belief_propagation` (×1.5 per
        retry) and `full_ite._harden_bp_config_if_struggled`; this is the
        whole-tree form used when a run is restarted harder."""
        cfg = self.copy()
        cfg.bp = dataclasses.replace(cfg.bp, trunc_dim=int(cfg.bp.trunc_dim * factor) + 1)
        cfg.contraction.trunc_dim = int(self.chi * factor) + 1
        return cfg

    def for_measurements(self, chi_factor: float = 2.0) -> "Config":
        """The measurement-time config: block N+1, contraction χ×factor and
        the BPConfig.for_measurements hardening (reference: run_ite.py:49-55
        → main.py:133-151).  A custom `change_config_for_measurements_func`
        replaces the default transform entirely."""
        if self.change_config_for_measurements_func is not None:
            return self.change_config_for_measurements_func(self.copy())
        cfg = self.copy()
        cfg.dims.big_lattice_size += 1
        cfg.contraction.trunc_dim = int(self.chi * chi_factor)
        cfg.bp = cfg.bp.for_measurements(chi_factor)
        return cfg
