#!/usr/bin/env python
"""Phase profile of one BP outgoing-message contraction (VERDICT r2 #5:
"profile first, then decide the Pallas target").

Runs `execute_plan` EAGERLY (no jit) with the linalg entry points wrapped in
blocking timers, so wall time decomposes into:

    qr        — qr_stable calls (canonicalisation sweeps + blob splits)
    svd       — svd_trunc/svd_trunc_auto calls (bond truncation)
    other     — tensordot/einsum contraction work + dispatch glue

Eager dispatch adds per-op overhead (~0.5 ms on axon), so absolute numbers
overstate the jitted cost; the *fractions* identify the hot phase.  The
jitted end-to-end sweep time from tools/bench_scaling.py is the ground
truth for totals.

Usage: python tools/profile_bp_phases.py [Ds...] [--platform cpu] [--single]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("Ds", nargs="*", type=int, default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("-N", type=int, default=2)
    p.add_argument("--single", action="store_true", help="single-layer swallow mode")
    p.add_argument("--reps", type=int, default=1)
    args = p.parse_args(argv)
    Ds = args.Ds or [3, 4, 5]

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.algo import contraction as C
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.ops import contract as X
    from kagomeperiodicbp_tpu.ops import linalg as L

    acc = {"qr": 0.0, "svd": 0.0, "n_qr": 0, "n_svd": 0}
    real_qr, real_svd_auto, real_svd = L.qr_stable, L.svd_trunc_auto, L.svd_trunc

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            acc[name] += time.perf_counter() - t0
            acc["n_" + name] += 1
            return out

        return wrap

    # patch the executor's view of the linalg entry points
    X.qr_stable = timed("qr", real_qr)
    X.svd_trunc_auto = timed("svd", real_svd_auto)
    X.svd_trunc = timed("svd", real_svd)

    platform = jax.devices()[0].platform
    for D in Ds:
        chi = 2 * D * D
        dtype = jnp.complex64
        cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(0), dtype=dtype)
        msgs = C.initial_messages(args.N, D, chi, model="uniform", dtype=dtype)
        msg_sites = {int(s): tuple(m.sites) for s, m in msgs.items()}

        plan = C.to_message_plan(args.N, D, chi, chi, 0)
        if args.single:
            plan = C.single_layer_plan(plan)
            fetch = C._make_fetch(None, msg_sites, kets=(cell.A, cell.B, cell.C))
        else:
            fused = C.fused_cells(cell)
            fetch = C._make_fetch(fused, msg_sites)

        # warmup (fills the eager op cache)
        out = X.execute_plan(plan, fetch)
        jax.block_until_ready(out.sites if hasattr(out, "sites") else out)

        for k in acc:
            acc[k] = 0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = X.execute_plan(plan, fetch)
            jax.block_until_ready(out.sites if hasattr(out, "sites") else out)
        total = (time.perf_counter() - t0) / args.reps
        qr, svd = acc["qr"] / args.reps, acc["svd"] / args.reps
        print(json.dumps({
            "platform": platform, "D": D, "N": args.N, "chi": chi,
            "single_layer": bool(args.single),
            "total_s": round(total, 4),
            "qr_s": round(qr, 4), "svd_s": round(svd, 4),
            "other_s": round(total - qr - svd, 4),
            "qr_frac": round(qr / total, 3), "svd_frac": round(svd / total, 3),
            "n_qr": acc["n_qr"] // args.reps, "n_svd": acc["n_svd"] // args.reps,
        }), flush=True)

    X.qr_stable, X.svd_trunc_auto, X.svd_trunc = real_qr, real_svd_auto, real_svd
    return 0


if __name__ == "__main__":
    sys.exit(main())
