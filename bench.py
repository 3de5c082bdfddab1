#!/usr/bin/env python
"""Benchmark: BP sweeps/second on the flagship config (single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The baseline is the reference's pure-NumPy BlockBP on CPU; no wall-clock
numbers are published (BASELINE.md), so vs_baseline is measured against a
conservative estimate of the reference's per-sweep time at the same
(N, D, χ) — see BASELINE_SWEEP_SECONDS below.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from kagomeperiodicbp_tpu.utils.jaxtools import enable_compilation_cache

enable_compilation_cache()

# Reference implementation (NGBigField/KagomePeriodicBP, pure NumPy
# bubblecon) measured ON THIS MACHINE's CPU: belief_propagation at
# D=3, N=2, chi=18, 6 sweeps in 6.02 s → 1.003 s/sweep
# (tools/measure_reference_baseline.py).
BASELINE_SWEEP_SECONDS = 1.003

N, D, CHI = 2, 3, 18


def main():
    dtype = jnp.complex64
    from kagomeperiodicbp_tpu.algo import contraction as C, fused as F
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell

    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(0), dtype=dtype)
    fused = C.fused_cells(cell)
    msgs = C.initial_messages(N, D, CHI, model="uniform", dtype=dtype)
    step = F.bp_iteration(N, D, CHI, CHI, None)
    sites = F._msgs_to_sites(msgs)

    # warmup/compile
    sites, err = step(fused, sites)
    jax.block_until_ready(err)

    n_sweeps = 20
    t0 = time.perf_counter()
    for _ in range(n_sweeps):
        sites, err = step(fused, sites)
    jax.block_until_ready(err)
    dt = (time.perf_counter() - t0) / n_sweeps

    sweeps_per_sec = 1.0 / dt
    vs_baseline = BASELINE_SWEEP_SECONDS / dt
    print(json.dumps({
        "metric": f"bp_sweeps_per_second_D{D}_N{N}_chi{CHI}",
        "value": round(sweeps_per_sec, 4),
        "unit": "sweeps/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


class _BenchTimeout(Exception):
    pass


if __name__ == "__main__":
    # Watchdog: the axon remote compiler occasionally hangs (not just fails);
    # a hung bench would leave the driver with no JSON line at all. SIGALRM
    # converts the hang into the error-JSON fallback.
    import signal

    def _alarm(signum, frame):
        raise _BenchTimeout("watchdog: compile/run exceeded budget")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("KPBP_BENCH_TIMEOUT", "480")))
    try:
        main()
        signal.alarm(0)
    except Exception as exc:  # noqa: BLE001 — the driver needs ONE JSON line
        # KeyboardInterrupt/SystemExit propagate (a manual abort must not be
        # recorded as a 0.0 measurement); _BenchTimeout and backend errors
        # are genuine failure datapoints
        print(json.dumps({
            "metric": f"bp_sweeps_per_second_D{D}_N{N}_chi{CHI}",
            "value": 0.0,
            "unit": "sweeps/s",
            "vs_baseline": 0.0,
            "error": repr(exc)[:200],
        }))
