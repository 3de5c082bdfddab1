#!/usr/bin/env python
"""Bisect which BP sub-program fails on the current backend.

Runs, in order: (1) one-side outgoing contraction, (2) distance-parts,
(3) combine, (4) full bp_iteration sweep — at the given (N, D, chi) —
each under its own alarm, printing a JSON status line per stage.

Usage: python tools/probe_bp_programs.py [D] [N] [chi]
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Timeout(Exception):
    pass


def _alarm(signum, frame):
    raise _Timeout("stage exceeded alarm")


def stage(name, fn, seconds=None):
    if seconds is None:
        seconds = int(os.environ.get("KPBP_STAGE_ALARM", "240"))
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(seconds)
    t0 = time.time()
    try:
        fn()
        print(json.dumps({"stage": name, "ok": True,
                          "seconds": round(time.time() - t0, 1)}), flush=True)
        return True
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"stage": name, "ok": False,
                          "seconds": round(time.time() - t0, 1),
                          "error": repr(exc)[:200]}), flush=True)
        return False
    finally:
        signal.alarm(0)


def main():
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    chi = int(sys.argv[3]) if len(sys.argv) > 3 else 2 * D * D

    import jax
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.algo import contraction as C, fused as F
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.utils.jaxtools import to_numpy

    dtype = jnp.complex64
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(0), dtype=dtype)
    msgs = C.initial_messages(N, D, chi, model="uniform", dtype=dtype)
    fused = C.fused_cells(cell)
    sites = F._msgs_to_sites(msgs)
    print(json.dumps({"platform": jax.devices()[0].platform,
                      "on_axon": F.__dict__.get("_on_axon", None) is None or None,
                      "D": D, "N": N, "chi": chi}), flush=True)

    holder = {}

    def s1():
        out_fn = F._one_side_outgoing_jit(N, D, chi, chi, 0, False)
        new_sites, new_log = out_fn(fused, sites)
        jax.block_until_ready(new_log)
        to_numpy(new_log)
        holder["new"] = (new_sites, new_log)

    def s2():
        parts_fn = F._distance_parts_jit()
        new_sites, new_log = holder["new"]
        from kagomeperiodicbp_tpu.lattices import BlockSide
        tgt = int(BlockSide(0).opposite())
        r0, lr = parts_fn(sites[tgt], new_sites, new_log)
        jax.block_until_ready(lr)
        to_numpy(r0), to_numpy(lr)
        holder["parts"] = (r0, lr)

    def s3():
        r0, lr = holder["parts"]
        err = F._combine_distances()(jnp.stack([r0] * 6), jnp.stack([lr] * 6))
        jax.block_until_ready(err)
        to_numpy(err)

    def s4():
        step = F.bp_iteration(N, D, chi, chi, None)
        s, err = step(fused, sites)
        jax.block_until_ready(err)
        to_numpy(err)

    ok = stage("outgoing", s1)
    if ok:
        ok = stage("distance_parts", s2)
    if ok:
        stage("combine", s3)
    stage("full_sweep", s4,
          seconds=2 * int(os.environ.get("KPBP_STAGE_ALARM", "240")))


if __name__ == "__main__":
    main()
