#!/usr/bin/env python
"""Parameter-sweep entry point — the HTCondor-sender replacement.

(reference: /root/reference/scripts/condor/main_sender.py:57)

Examples:
    python scripts/run_sweep.py --Ds 2 3 --seeds 0 1 2 --method ite --steps 30
    python scripts/run_sweep.py --Ds 2 --noises 0 0.01 --csv data/sweeps/noise.csv
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--Ds", type=int, nargs="+", default=[2])
    p.add_argument("--Ns", type=int, nargs="+", default=[2])
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--chi-factors", type=float, nargs="+", default=[1.0])
    p.add_argument("--noises", type=float, nargs="*", default=[])
    p.add_argument("--method", default="ite", choices=["ite", "bp"])
    p.add_argument("--chain", default=None, metavar="STAGES",
                   help="comma-separated DAG stages per point, e.g. "
                        "'su,ite,measure' — dependent jobs with each stage "
                        "consuming its parent's saved cell (reference: "
                        "condor/CondorJobSender.py send_dag_of_jobs)")
    p.add_argument("--steps-per-dt", type=int, default=10)
    p.add_argument("--steps", type=int, default=None, help="limit ITE segments")
    p.add_argument("--dt-start", type=float, default=1e-2)
    p.add_argument("--dt-stop", type=float, default=1e-4)
    p.add_argument("--csv", default="data/sweeps/results.csv")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import jax

    from kagomeperiodicbp_tpu.utils.jaxtools import enable_compilation_cache
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compilation_cache()
    if (args.platform or os.environ.get("JAX_PLATFORMS")) == "cpu":
        # f64 measurements on CPU (x64 stays off for chip runs: the axon
        # remote compiler hangs on x64 programs)
        jax.config.update("jax_enable_x64", True)

    from kagomeperiodicbp_tpu.parallel.sweep import SweepPoint, grid, ite_worker, run_sweep
    from kagomeperiodicbp_tpu.algo.ite import default_time_steps

    noises = [None if n == 0 else n for n in args.noises] or [None]
    points = grid(Ds=args.Ds, Ns=args.Ns, seeds=args.seeds,
                  chi_factors=args.chi_factors, noises=noises, method=args.method)
    print(f"sweep: {len(points)} points → {args.csv}")

    if args.chain:
        import dataclasses

        from kagomeperiodicbp_tpu.parallel.sweep import chain, dag_stage_worker, run_dag

        stages = [s.strip() for s in args.chain.split(",") if s.strip()]
        extra = (("dt_start", args.dt_start), ("dt_stop", args.dt_stop),
                 ("steps_per_dt", args.steps_per_dt))
        jobs = []
        for pt in points:
            tag = f"D{pt.D}_N{pt.N}_s{pt.seed}"
            jobs.extend(chain(stages, dataclasses.replace(pt, extra=extra), tag=tag))
        print(f"chain mode: {len(stages)} stages × {len(points)} points "
              f"= {len(jobs)} DAG jobs")
        results = run_dag(jobs, dag_stage_worker, csv_path=args.csv)
        ok = sum(1 for r in results.values() if r and "error" not in r)
        print(f"done: {ok}/{len(jobs)} jobs succeeded")
        return results

    steps = default_time_steps(args.dt_start, args.dt_stop, 20)
    if args.steps:
        steps = steps[: args.steps]

    if args.method == "ite":
        worker = lambda pt: ite_worker(pt, steps=steps)  # noqa: E731
    else:
        def worker(pt):
            import jax as _jax

            from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
            from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell

            cell = UnitCell.random(d=2, D=pt.D, key=_jax.random.PRNGKey(pt.seed))
            msgs, stats = robust_belief_propagation(
                cell, None, BPConfig(trunc_dim=2 * pt.D**2), pt.N
            )
            return {"bp_error": stats.final_error, "iterations": stats.iterations,
                    "duration": stats.duration}

    results = run_sweep(points, worker, csv_path=args.csv)
    ok = sum(1 for r in results if "error" not in r)
    print(f"done: {ok}/{len(points)} succeeded")
    return results


if __name__ == "__main__":
    main()
