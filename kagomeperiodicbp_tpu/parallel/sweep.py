"""Parameter-sweep runner — the TPU-native replacement for the reference's
HTCondor job sender (/root/reference/scripts/condor/main_sender.py:57,
worker.py:38).

Instead of cluster jobs, sweep points run either sequentially in-process
(sharing the jit cache — usually fastest on one chip) or **concurrently in
worker processes** (the reference's `_local_test` mode spawns real local
jobs, main_sender.py:144-156): `n_workers > 1` fans the points out over a
spawn-context process pool, each child pinned to its own platform (CPU by
default — TPU chips don't multiplex across processes), with results
appended to a CSV by the parent.
"""
from __future__ import annotations

import itertools
import json
import os
import time
import traceback
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence

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


def _child_init(platform: Optional[str]) -> None:
    """Process-pool initializer: pin the child's JAX platform before the
    backend initializes (sitecustomize pins JAX_PLATFORMS pre-import, so the
    env var alone is not enough — set the config too)."""
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        import jax

        jax.config.update("jax_platforms", platform)


def _guarded(worker: Callable[[SweepPoint], Dict[str, Any]], pt: SweepPoint) -> Dict[str, Any]:
    t0 = time.time()
    try:
        out = {"status": "ok", "out": worker(pt)}
    except Exception as exc:  # noqa: BLE001 — sweep must survive bad points
        out = {
            "status": f"error: {type(exc).__name__}",
            "out": {"error": str(exc)},
            "traceback": traceback.format_exc(limit=2),
        }
    # measured inside the worker process: actual runtime, not queue wait
    out["exec_time"] = time.time() - t0
    return out


def run_sweep(
    points: Sequence[SweepPoint],
    worker: Callable[[SweepPoint], Dict[str, Any]],
    csv_path: str = "data/sweeps/results.csv",
    devices: Optional[Sequence] = None,
    n_workers: int = 1,
    child_platform: Optional[str] = "cpu",
) -> List[Dict[str, Any]]:
    """Run `worker` on every point, recording results + timing to CSV.
    Failures are recorded, not fatal (the condor workers' CSV-row semantics,
    worker.py:156).

    * ``n_workers == 1``: sequential in-process (shares the jit cache; pass
      ``devices`` to round-robin points over local jax devices).
    * ``n_workers > 1``: a spawn-context process pool — real concurrency.
      ``worker`` must be a module-level (picklable) callable;
      ``child_platform`` pins each child's JAX platform (default "cpu").
    """
    columns = ["D", "N", "chi_factor", "seed", "method", "noise", "exec_time", "status", "result"]
    csvm = CSVManager(csv_path, columns)
    results: List[Dict[str, Any]] = []

    if n_workers > 1:
        import concurrent.futures as cf
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        with cf.ProcessPoolExecutor(
            max_workers=n_workers, mp_context=ctx,
            initializer=_child_init, initargs=(child_platform,),
        ) as pool:
            futures = {pool.submit(_guarded, worker, pt): i
                       for i, pt in enumerate(points)}
            ordered: List[Optional[Dict[str, Any]]] = [None] * len(points)
            for fut in cf.as_completed(futures):
                i = futures[fut]
                try:
                    ordered[i] = fut.result()
                except Exception as exc:  # noqa: BLE001 — child died hard
                    ordered[i] = {"status": f"error: {type(exc).__name__}",
                                  "out": {"error": str(exc)}, "exec_time": 0.0}
        for i, pt in enumerate(points):
            res = ordered[i] or {"status": "error: lost", "out": {}, "exec_time": 0.0}
            row = pt.as_dict()
            row["status"] = res["status"]
            row["result"] = json.dumps(res["out"], default=str)
            row["exec_time"] = round(res.get("exec_time", 0.0), 3)
            csvm.append(row)
            results.append(res["out"])
        return results

    import jax

    for i, pt in enumerate(points):
        row = pt.as_dict()
        if devices:
            with jax.default_device(devices[i % len(devices)]):
                res = _guarded(worker, pt)
        else:
            res = _guarded(worker, pt)
        row["status"] = res["status"]
        row["result"] = json.dumps(res["out"], default=str)
        row["exec_time"] = round(res.get("exec_time", 0.0), 3)
        csvm.append(row)
        results.append(res["out"])
    return results


def smoke_worker(pt: SweepPoint) -> Dict[str, Any]:
    """Minimal worker used by tests and dry runs: one tiny jitted program in
    the child process, proving the pool + per-child JAX platform wiring."""
    import jax
    import jax.numpy as jnp

    x = jnp.arange(pt.D * pt.N, dtype=jnp.float32)
    val = float(jax.jit(lambda v: (v * v).sum())(x))
    return {"pid_value": val, "platform": jax.devices()[0].platform,
            "seed": pt.seed}


def ite_worker(pt: SweepPoint, steps: Optional[List[float]] = None) -> Dict[str, Any]:
    """Default 'ite' sweep job: run full_ite at the point's parameters
    (reference: condor/send_ite.py)."""
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
