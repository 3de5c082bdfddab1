#!/usr/bin/env python
"""BP-sweep throughput across bond dimensions on the current platform.

Produces the D-scaling table for README/BENCHMARKS (compare with
tools/measure_reference_baseline.py run at the same D, N, χ).

Usage: python tools/bench_scaling.py [Ds...]   (default 2 3 4 5)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kagomeperiodicbp_tpu.utils.jaxtools import enable_compilation_cache

enable_compilation_cache()


def bench_D(D: int, N: int = 2, n_sweeps: int = 20, dtype=jnp.complex64,
            single_layer: bool = None):
    from kagomeperiodicbp_tpu.algo import contraction as C, fused as F
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell

    if single_layer is None:
        single_layer = D >= 6 or os.environ.get("KPBP_BENCH_SINGLE_LAYER") == "1"
    chi = 2 * D * D
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(0), dtype=dtype)
    msgs = C.initial_messages(N, D, chi, model="uniform", dtype=dtype)
    step = F.bp_iteration(N, D, chi, chi, None, single=single_layer)
    fused = (cell.A, cell.B, cell.C) if single_layer else C.fused_cells(cell)
    sites = F._msgs_to_sites(msgs)

    t_c0 = time.perf_counter()
    sites, err = step(fused, sites)
    jax.block_until_ready(err)
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for _ in range(n_sweeps):
        sites, err = step(fused, sites)
    jax.block_until_ready(err)
    dt = (time.perf_counter() - t0) / n_sweeps
    return {"D": D, "N": N, "chi": chi, "sweep_seconds": round(dt, 6),
            "sweeps_per_second": round(1.0 / dt, 2),
            "first_iteration_seconds": round(compile_s, 1),
            "single_layer": bool(single_layer)}


def main():
    ds = [int(x) for x in sys.argv[1:]] or [2, 3, 4, 5]
    platform = jax.devices()[0].platform
    for D in ds:
        try:
            row = bench_D(D)
            row["platform"] = platform
            print(json.dumps(row), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"D": D, "error": repr(exc)[:200]}), flush=True)


if __name__ == "__main__":
    main()
