#!/usr/bin/env python
"""χ-shard scaling smoke: wall-clock of the sharded BP sweep vs mesh size.

VERDICT r4 (#9): `parallel/chi_shard.py` is correctness-proven
(tests/test_chi_shard.py, dryrun step 3); this records one *scaling* datum —
the same production-shape sharded program executed over 1/2/4/8 devices so
the GSPMD collective pattern is exercised and its overhead measured. On the
single-core CPU host the virtual mesh cannot speed anything up (all
"devices" share the core); the interesting column is that wall-clock stays
~flat — partitioning + ICI-style collectives add no superlinear cost — which
is the precondition for real speedup on a multi-chip ICI mesh. On real
multi-chip hardware the same entry point is the measurement
(tools/chip_battery.sh runs it with --platform axon when a mesh exists).

Usage: python -u tools/chi_shard_scaling.py [--D 4] [--chi 32] [--devices 1 2 4 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--D", type=int, default=4)
p.add_argument("--N", type=int, default=2)
p.add_argument("--chi", type=int, default=32, help="2·D² production convention")
p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
p.add_argument("--sweeps", type=int, default=2, help="timed sweeps after 1 warmup")
p.add_argument("--platform", default="cpu")
p.add_argument("--out", default="data/chi_shard_scaling.json")
args = p.parse_args()

if args.platform == "cpu":
    # must precede jax import: virtual host devices are a startup flag
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={max(args.devices)}"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", args.platform)
import jax.numpy as jnp  # noqa: E402

from kagomeperiodicbp_tpu.algo import contraction as C  # noqa: E402
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell  # noqa: E402
from kagomeperiodicbp_tpu.parallel import chi_shard as CS  # noqa: E402

N, D, chi = args.N, args.D, args.chi
cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(0), dtype=jnp.complex64)
msgs = C.initial_messages(N, D, chi=chi, model="random", key=jax.random.PRNGKey(1),
                          dtype=jnp.complex64)
fused = C.fused_cells(cell)
avail = jax.devices()
print(f"[chi_shard_scaling] platform={avail[0].platform} devices={len(avail)} "
      f"D={D} N={N} chi={chi}", flush=True)

rows = []
for n in args.devices:
    if n > len(avail):
        print(f"[chi_shard_scaling] skip n={n}: only {len(avail)} devices", flush=True)
        continue
    mesh = CS.chi_mesh(avail[:n])
    CS.bp_sweep_sharded(fused, msgs, N, D, chi, chi, mesh)      # warmup/compile
    t0 = time.time()
    err = None
    for _ in range(args.sweeps):
        _, err = CS.bp_sweep_sharded(fused, msgs, N, D, chi, chi, mesh)
    dt = (time.time() - t0) / args.sweeps
    row = {"platform": avail[0].platform, "n_devices": n, "D": D, "N": N,
           "chi": chi, "s_per_sweep": round(dt, 3), "bp_err_after": err}
    rows.append(row)
    print(f"[chi_shard_scaling] n={n}: {dt:.3f} s/sweep", flush=True)

os.makedirs(os.path.dirname(args.out), exist_ok=True)
with open(args.out, "a") as fh:
    for r in rows:
        fh.write(json.dumps(r) + "\n")
print(f"[chi_shard_scaling] {len(rows)} rows appended to {args.out}", flush=True)
