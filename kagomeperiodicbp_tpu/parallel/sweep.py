"""Parameter-sweep runner — the TPU-native replacement for the reference's
HTCondor job sender (/root/reference/scripts/condor/main_sender.py:57,
worker.py:38).

Instead of cluster jobs, sweep points run either sequentially in-process
(sharing the jit cache — usually fastest on one chip) or as local
subprocesses (the reference's `_local_test` mode, main_sender.py:144), with
results appended to a CSV. Multi-chip: shard points over jax devices via
the `devices` argument (each point pinned with jax.default_device).
"""
from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys
import time
import traceback
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

from ..utils.csvs import CSVManager


@dataclass(frozen=True)
class SweepPoint:
    D: int = 2
    N: int = 2
    chi_factor: float = 1.0
    seed: int = 0
    method: str = "ite"          # 'ite' | 'bp' | custom key
    noise: Optional[float] = None
    extra: tuple = ()

    def as_dict(self) -> Dict[str, Any]:
        d = {k: getattr(self, k) for k in ("D", "N", "chi_factor", "seed", "method", "noise")}
        d.update(dict(self.extra))
        return d


def grid(Ds=(2,), Ns=(2,), seeds=(0,), chi_factors=(1.0,), noises=(None,), method="ite") -> List[SweepPoint]:
    """Cartesian product of sweep parameters
    (reference: main_sender.py:42-52 request_* lists)."""
    return [
        SweepPoint(D=D, N=N, chi_factor=c, seed=s, method=method, noise=n)
        for D, N, c, s, n in itertools.product(Ds, Ns, chi_factors, seeds, noises)
    ]


def run_sweep(
    points: Sequence[SweepPoint],
    worker: Callable[[SweepPoint], Dict[str, Any]],
    csv_path: str = "data/sweeps/results.csv",
    devices: Optional[Sequence] = None,
) -> List[Dict[str, Any]]:
    """Run `worker` on every point, recording results + timing to CSV.
    Failures are recorded, not fatal (the condor workers' CSV-row semantics,
    worker.py:156)."""
    columns = ["D", "N", "chi_factor", "seed", "method", "noise", "exec_time", "status", "result"]
    csvm = CSVManager(csv_path, columns)
    results = []
    import jax

    for i, pt in enumerate(points):
        t0 = time.time()
        row = pt.as_dict()
        try:
            if devices:
                with jax.default_device(devices[i % len(devices)]):
                    out = worker(pt)
            else:
                out = worker(pt)
            row["status"] = "ok"
            row["result"] = json.dumps(out, default=str)
            results.append(out)
        except Exception as exc:  # noqa: BLE001 — sweep must survive bad points
            row["status"] = f"error: {type(exc).__name__}"
            row["result"] = traceback.format_exc(limit=2)
            results.append({"error": str(exc)})
        row["exec_time"] = round(time.time() - t0, 3)
        csvm.append(row)
    return results


def ite_worker(pt: SweepPoint, steps: Optional[List[float]] = None) -> Dict[str, Any]:
    """Default 'ite' sweep job: run full_ite at the point's parameters
    (reference: condor/send_ite.py)."""
    import jax.numpy as jnp

    from ..algo.bp import BPConfig
    from ..algo.ite import ITEConfig, default_time_steps, full_ite
    from ..physics import hamiltonians

    cfg = ITEConfig(
        hamiltonian=hamiltonians.heisenberg_afm,
        time_steps=steps or default_time_steps(1e-2, 1e-4, 20),
        add_gaussian_noise_fraction=pt.noise,
        seed=pt.seed,
    )
    chi = int(2 * pt.D**2 * pt.chi_factor) + 10
    bp = BPConfig(trunc_dim=2 * pt.D * pt.D)
    best, cell, tracker = full_ite(None, cfg, N=pt.N, D=pt.D, chi=chi, bp_config=bp)
    return {"best_energy": best, "segments": len(tracker.energies)}
