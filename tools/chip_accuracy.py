#!/usr/bin/env python
"""On-chip measurement accuracy: complex64-on-TPU vs the float64 CPU
pipeline (VERDICT r1 item 5 — the f64-grade-energies-from-the-chip bar:
agreement ≤ 1e-6 at D=3 makes chip measurement passes trustworthy for the
ITE-to-ground-state workload).

Runs the same robust-BP + RDM energy measurement twice on the best-store
cell for D (or a seeded random cell): once on the default (axon TPU)
platform in complex64, once on CPU in complex128, and prints one JSON line
with both energies and their difference.

Usage: python tools/chip_accuracy.py [D] [N]
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import json, sys
import jax
platform, dtype_name, D, N = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
jax.config.update("jax_platforms", platform)
if dtype_name == "complex128":
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from kagomeperiodicbp_tpu.utils.best_store import load_best
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.algo.bp import BPConfig, robust_belief_propagation
from kagomeperiodicbp_tpu.algo.measurements import measure_energies_and_observables
from kagomeperiodicbp_tpu.physics import hamiltonians
dtype = jnp.complex128 if dtype_name == "complex128" else jnp.complex64
rec = load_best(D)
if rec is not None:
    cell = rec[0].astype(dtype)
else:
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(0), dtype=dtype)
h = hamiltonians.heisenberg_afm()
bp = BPConfig(trunc_dim=2 * D * D, dtype=dtype)
msgs, st = robust_belief_propagation(cell, None, bp, N)
meas = measure_energies_and_observables(cell, msgs, N, 2 * D * D + 10, bp.trunc_dim, h)
print(json.dumps({"platform": platform, "dtype": dtype_name,
                  "energy": meas.mean_energy, "bp_error": st.final_error,
                  "from_best_store": rec is not None}))
"""


def run_child(platform: str, dtype: str, D: int, N: int, timeout: int):
    out = subprocess.run(
        [sys.executable, "-c", CHILD, platform, dtype, str(D), str(N)],
        capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child failed: {out.stderr[-400:]}")


def main():
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpu = run_child("cpu", "complex128", D, N, timeout=1800)
    chip = run_child("axon", "complex64", D, N, timeout=1800)
    diff = abs(chip["energy"] - cpu["energy"])
    print(json.dumps({
        "D": D, "N": N,
        "energy_cpu_f64": cpu["energy"],
        "energy_chip_c64": chip["energy"],
        "abs_diff": diff,
        "meets_1e-6": diff <= 1e-6,
    }))


if __name__ == "__main__":
    main()
