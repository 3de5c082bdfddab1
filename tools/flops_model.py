#!/usr/bin/env python
"""Flops accounting for the bench programs (VERDICT r4 next #5).

Computes flops per BP sweep and per ITE edge-update step for the flagship
bench config by asking XLA itself: every fused program is lowered and
compiled on the XLA:CPU backend and its `cost_analysis()["flops"]` summed.
This beats a hand-summed einsum model — it counts the *compiled* program
(after fusion, including the QR/SVD ladders), at the exact runtime shapes
the bench executes, and it is the same math the chip executes (c64, same
traced graph), so the number converts any measured sweeps/s into achieved
flops on either backend.

Writes data/flops_model.json keyed by the bench config; bench.py reads it
to emit flops_per_sweep / achieved_tflops / mfu.

Usage:  python tools/flops_model.py            # bench config (N=2 D=3 chi=18)
        python tools/flops_model.py -N 2 -D 4 --chi 32
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "data", "flops_model.json")


def _flops(wrapper, *args) -> float:
    """Total XLA-estimated flops of one resilient_jit-wrapped program."""
    jitted = wrapper._state["jitted"]
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def model(N: int, D: int, chi: int, chi_msg: int | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    chi_msg = chi_msg or chi

    from kagomeperiodicbp_tpu.algo import contraction as C, fused as F
    from kagomeperiodicbp_tpu.enums import UnitCellFlavor, UpdateEdge
    from kagomeperiodicbp_tpu.lattices import BlockSide
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.physics import hamiltonians

    dtype = jnp.complex64
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(0), dtype=dtype)
    fused = C.fused_cells(cell)
    msgs = C.initial_messages(N, D, chi_msg, model="uniform", dtype=dtype)
    sites = F._msgs_to_sites(msgs)

    # one BP sweep = 6 per-side message programs + the tiny combine
    sweep = 0.0
    for side in BlockSide:
        fn = F._one_side_update(N, D, chi, chi_msg, False, int(side), False)
        sweep += _flops(fn, fused, sites)
    r0s = jnp.ones((6,), jnp.float32)
    sweep += _flops(F._combine_distances(), r0s, r0s)

    # one ITE edge update = env program + gate/ALS program (bench config:
    # chi_env = 2*D*D+10, reference global_config.py:43-48; als_iters=10)
    chi_env = 2 * D * D + 10
    edge = UpdateEdge(UnitCellFlavor.A, UnitCellFlavor.B)
    env_fn = F._edge_env_jit(N, D, chi_env, chi_msg, edge)
    cells = (cell.A, cell.B, cell.C)
    env_flops = _flops(env_fn, cells, sites)
    t1, t2, env = env_fn(cells, sites)
    als_fn = F._gate_als_jit(D, edge, 10, True)
    h = jnp.asarray(hamiltonians.heisenberg_afm(), dtype)
    dt_g = jnp.asarray(1e-3, jnp.float32)
    als_flops = _flops(als_fn, t1, t2, env, h, dt_g)

    return {
        "config": {"N": N, "D": D, "chi": chi, "chi_msg": chi_msg,
                   "chi_env": chi_env, "dtype": "complex64"},
        "flops_per_bp_sweep": sweep,
        "flops_per_ite_step": env_flops + als_flops,
        "source": "XLA cost_analysis of the compiled fused programs (CPU backend)",
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-N", type=int, default=2)
    p.add_argument("-D", type=int, default=3)
    p.add_argument("--chi", type=int, default=18)
    p.add_argument("--chi-msg", type=int, default=None)
    args = p.parse_args(argv)

    rec = model(args.N, args.D, args.chi, args.chi_msg)
    key = f"N{args.N}_D{args.D}_chi{args.chi}"
    try:
        with open(OUT) as fh:
            all_recs = json.load(fh)
    except Exception:
        all_recs = {}
    all_recs[key] = rec
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(all_recs, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
