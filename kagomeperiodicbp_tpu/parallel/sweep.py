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


# --------------------------------------------------------------------------
# DAG-dependent jobs (reference: scripts/condor/CondorJobSender.py builds a
# networkx dependency DAG of condor jobs — send_dag_of_jobs — so chained
# campaigns like SU → ITE → measure run per sweep point with each stage
# consuming its parent's output). Here the DAG is scheduled locally with
# Kahn's algorithm over the same worker/pool machinery as run_sweep; a failed
# job skips its descendants (DAGMan semantics) instead of aborting the sweep.
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class DagJob:
    """One node of a dependent-job DAG.

    ``worker(point, parents)`` receives ``parents`` = {parent job name →
    that job's result dict}, so a child stage can consume its parents'
    outputs (e.g. the path of the cell the SU stage saved).
    """

    name: str
    point: SweepPoint = SweepPoint()
    depends_on: tuple = ()


def chain(stages: Sequence[str], point: SweepPoint, tag: str = "") -> List[DagJob]:
    """A linear pipeline (SU → ITE → measure) over one sweep point — the
    reference's chained-condor-jobs use case, one DagJob per stage; each
    stage's ``point.method`` is the stage name."""
    import dataclasses

    jobs: List[DagJob] = []
    prev: tuple = ()
    for stage in stages:
        name = f"{tag or 'pt'}:{stage}"
        jobs.append(DagJob(name=name,
                           point=dataclasses.replace(point, method=stage),
                           depends_on=prev))
        prev = (name,)
    return jobs


def _guarded_dag(worker, job: DagJob, parents: Dict[str, Dict[str, Any]]) -> Dict[str, Any]:
    t0 = time.time()
    try:
        out = {"status": "ok", "out": worker(job.point, parents)}
    except Exception as exc:  # noqa: BLE001 — a bad node must not kill the DAG
        out = {"status": f"error: {type(exc).__name__}",
               "out": {"error": str(exc)},
               "traceback": traceback.format_exc(limit=2)}
    out["exec_time"] = time.time() - t0
    return out


def run_dag(
    jobs: Sequence[DagJob],
    worker: Callable[[SweepPoint, Dict[str, Dict[str, Any]]], Dict[str, Any]],
    csv_path: str = "data/sweeps/dag_results.csv",
    n_workers: int = 1,
    child_platform: Optional[str] = "cpu",
) -> Dict[str, Dict[str, Any]]:
    """Run a dependency DAG of jobs; returns {job name → result dict}.

    * Ready jobs (all parents succeeded) run concurrently when
      ``n_workers > 1`` (spawn pool, as in run_sweep) or sequentially in
      topological order otherwise.
    * A failed job marks every descendant ``skipped`` (recorded in the CSV,
      like DAGMan's noop-on-upstream-failure), the rest of the DAG continues.
    * Cycles and unknown dependency names raise ValueError up front.
    """
    by_name = {j.name: j for j in jobs}
    if len(by_name) != len(jobs):
        raise ValueError("duplicate DagJob names")
    for j in jobs:
        unknown = [d for d in j.depends_on if d not in by_name]
        if unknown:
            raise ValueError(f"{j.name}: unknown depends_on {unknown}")

    indeg = {j.name: len(set(j.depends_on)) for j in jobs}
    children: Dict[str, List[str]] = {j.name: [] for j in jobs}
    for j in jobs:
        for d in set(j.depends_on):
            children[d].append(j.name)

    columns = ["name", "depends_on", "D", "N", "chi_factor", "seed", "method",
               "noise", "exec_time", "status", "result"]
    csvm = CSVManager(csv_path, columns)
    results: Dict[str, Dict[str, Any]] = {}
    status: Dict[str, str] = {}

    def record(job: DagJob, res: Dict[str, Any]) -> None:
        status[job.name] = res["status"]
        results[job.name] = res["out"]
        row = job.point.as_dict()
        row.update(name=job.name, depends_on=";".join(job.depends_on),
                   status=res["status"],
                   result=json.dumps(res["out"], default=str),
                   exec_time=round(res.get("exec_time", 0.0), 3))
        csvm.append(row)

    def skip_descendants(name: str) -> None:
        for c in children[name]:
            if c not in status:
                record(by_name[c], {"status": f"skipped: upstream {name}",
                                    "out": {}, "exec_time": 0.0})
                skip_descendants(c)

    ready = [n for n, d in indeg.items() if d == 0]
    pool = None
    if n_workers > 1:
        import concurrent.futures as cf
        import multiprocessing as mp

        pool = cf.ProcessPoolExecutor(
            max_workers=n_workers, mp_context=mp.get_context("spawn"),
            initializer=_child_init, initargs=(child_platform,))

    try:
        pending: Dict[Any, str] = {}
        while ready or pending:
            while ready:
                name = ready.pop()
                if name in status:  # already skipped via a failed parent
                    continue
                job = by_name[name]
                parents = {d: results[d] for d in job.depends_on}
                if pool is not None:
                    pending[pool.submit(_guarded_dag, worker, job, parents)] = name
                else:
                    record(job, _guarded_dag(worker, job, parents))
                    if status[name] != "ok":
                        skip_descendants(name)
                    else:
                        for c in children[name]:
                            indeg[c] -= 1
                            if indeg[c] == 0:
                                ready.append(c)
            if pending:
                import concurrent.futures as cf

                done, _ = cf.wait(pending, return_when=cf.FIRST_COMPLETED)
                for fut in done:
                    name = pending.pop(fut)
                    job = by_name[name]
                    try:
                        res = fut.result()
                    except Exception as exc:  # noqa: BLE001 — child died hard
                        res = {"status": f"error: {type(exc).__name__}",
                               "out": {"error": str(exc)}, "exec_time": 0.0}
                    record(job, res)
                    if status[name] != "ok":
                        skip_descendants(name)
                    else:
                        for c in children[name]:
                            indeg[c] -= 1
                            if indeg[c] == 0:
                                ready.append(c)
    finally:
        if pool is not None:
            pool.shutdown()

    if len(status) != len(jobs):
        stuck = sorted(set(by_name) - set(status))
        raise ValueError(f"dependency cycle: {stuck} never became ready")
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


def dag_stage_worker(pt: SweepPoint, parents: Dict[str, Dict[str, Any]]) -> Dict[str, Any]:
    """The chained-campaign stage worker (su → ite → measure per sweep
    point — the reference's dependent condor jobs, send_ite.py chained via
    CondorJobSender DAGs). ``pt.method`` selects the stage; cells flow
    between stages as saved files (``cell_path`` in each result), so stages
    can run in different worker processes. Stage knobs ride ``pt.extra``:
    ``dt_start/dt_stop/steps_per_dt`` (ite), ``out_dir`` (all).
    """
    import jax
    import jax.numpy as jnp

    from ..networks.unit_cell import UnitCell
    from ..physics import hamiltonians

    extra = dict(pt.extra)
    out_dir = extra.get("out_dir", "data/sweeps/cells")
    os.makedirs(out_dir, exist_ok=True)
    h = hamiltonians.BY_NAME["AFM"]()
    parent_path = next((p["cell_path"] for p in parents.values()
                        if isinstance(p, dict) and p.get("cell_path")), None)
    tag = f"D{pt.D}_s{pt.seed}"

    if pt.method == "su":
        from ..algo.simple_update import simple_update

        cell, _ = simple_update(
            h, pt.D,
            time_steps=[0.1] * 60 + [0.01] * 60 + [1e-3] * 40,
            key=jax.random.PRNGKey(pt.seed))
        if pt.noise:
            cell = cell.add_noise(pt.noise, key=jax.random.PRNGKey(pt.seed + 1))
        path = cell.save(os.path.join(out_dir, f"su_{tag}.pkl"))
        return {"cell_path": path, "stage": "su"}

    if pt.method == "ite":
        from ..algo.bp import BPConfig
        from ..algo.ite import ITEConfig, default_time_steps, full_ite

        cell = UnitCell.load(parent_path) if parent_path else None
        cfg = ITEConfig(
            hamiltonian=hamiltonians.heisenberg_afm,
            time_steps=default_time_steps(
                float(extra.get("dt_start", 1e-2)),
                float(extra.get("dt_stop", 1e-4)),
                int(extra.get("steps_per_dt", 10))),
            seed=pt.seed)
        chi = int(2 * pt.D**2 * pt.chi_factor) + 10
        best, cell, tracker = full_ite(
            cell, cfg, N=pt.N, D=pt.D, chi=chi,
            bp_config=BPConfig(trunc_dim=2 * pt.D * pt.D))
        path = cell.save(os.path.join(out_dir, f"ite_{tag}.pkl"))
        return {"cell_path": path, "best_energy": float(best), "stage": "ite"}

    if pt.method == "measure":
        from ..algo.bp import BPConfig, robust_belief_propagation
        from ..algo.measurements import measure_energies_and_observables

        if parent_path is None:
            raise ValueError("measure stage needs an upstream cell_path")
        cell = UnitCell.load(parent_path).astype(jnp.complex128).force_zero_rotation()
        # the recording convention: block N+1, χ×2 (reference run_ite defaults)
        n_m = pt.N + 1
        bp_m = BPConfig(trunc_dim=2 * pt.D * pt.D,
                        dtype=jnp.complex128).for_measurements(2.0)
        chi_m = 2 * (2 * pt.D * pt.D + 10)
        msgs, stats = robust_belief_propagation(cell, None, bp_m, n_m)
        meas = measure_energies_and_observables(
            cell, msgs, n_m, chi_m, bp_m.trunc_dim, h)
        return {"energy": meas.mean_energy, "bp_error": stats.final_error,
                "cell_path": parent_path, "stage": "measure"}

    raise ValueError(f"unknown DAG stage {pt.method!r}")


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
