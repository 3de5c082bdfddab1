#!/usr/bin/env python
"""Accuracy-vs-retained-rank curve for the sketched range-finder swallow.

VERDICT r4 (#3): the gram-split sketch path (`ops/contract.py`
`_swallow_ket_gram_split`) retains rank s = 2χ+32 by default; this tool
measures how the truncated outgoing BP message's distance to an
effectively-exact reference varies with s, justifying (or correcting) that
default with data instead of the test suite's loose "within 2×" bound.

Protocol (mirrors tests/test_single_layer.py::
test_gram_split_message_quality_under_truncation):
  - random UnitCell at D, random initial messages at χ
  - m_exact  = double-layer outgoing message at χ_hi (no single-layer blob,
               no sketch — the oracle-grade path)
  - d_norm   = distance(single-layer ordinary path at χ, m_exact)
  - d(s)     = distance(single-layer sketch path at rank s and χ, m_exact)
               for s in a ladder around 2χ+32 (KPBP_BLOB_LIMIT=1 forces the
               sketch on every eligible swallow; KPBP_SKETCH_RANK pins s)

Output: one JSON line per (D, s) appended to data/sketch_rank_curve.json
and a human table on stdout.

Usage: python -u tools/sketch_rank_curve.py --D 6 --chi 24 [--chi-hi 72]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--D", type=int, default=6)
    p.add_argument("--N", type=int, default=2)
    p.add_argument("--chi", type=int, default=24)
    p.add_argument("--chi-hi", type=int, default=0,
                   help="reference χ (default 3·χ)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--out", default="data/sketch_rank_curve.json")
    args = p.parse_args()
    chi_hi = args.chi_hi or 3 * args.chi

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from kagomeperiodicbp_tpu.algo import contraction as C
    from kagomeperiodicbp_tpu.lattices.directions import BlockSide
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.ops import mps as mpslib

    N, D, chi = args.N, args.D, args.chi
    cell = UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(args.seed))
    msgs = C.initial_messages(N, D, chi=chi, model="random",
                              key=jax.random.PRNGKey(args.seed + 1))
    toward = BlockSide.U

    t0 = time.time()
    m_exact = C.outgoing_message(cell, msgs, N, D, chi_hi, chi, toward)
    t_exact = time.time() - t0
    print(f"[rank_curve] D={D} χ={chi}: double-layer reference at "
          f"χ_hi={chi_hi} in {t_exact:.1f}s", flush=True)

    os.environ.pop("KPBP_SKETCH_RANK", None)
    os.environ.pop("KPBP_BLOB_LIMIT", None)
    t0 = time.time()
    m_norm = C.outgoing_message_single(cell, msgs, N, D, chi, chi, toward)
    d_norm = float(mpslib.distance(m_norm, m_exact))
    t_norm = time.time() - t0
    print(f"[rank_curve] ordinary single-layer: d={d_norm:.3e} "
          f"({t_norm:.1f}s)", flush=True)

    rows: list[dict] = [{
        "D": D, "N": N, "chi": chi, "chi_hi": chi_hi, "seed": args.seed,
        "path": "ordinary", "rank": None, "distance": d_norm,
        "seconds": round(t_norm, 2),
    }]

    default_s = 2 * chi + 32
    ranks = sorted({chi // 2, chi, (3 * chi) // 2, 2 * chi, default_s,
                    3 * chi, 4 * chi, 10 ** 6})
    os.environ["KPBP_BLOB_LIMIT"] = "1"   # force the sketch on every swallow
    for s in ranks:
        os.environ["KPBP_SKETCH_RANK"] = str(s)
        t0 = time.time()
        m_s = C.outgoing_message_single(cell, msgs, N, D, chi, chi, toward)
        d_s = float(mpslib.distance(m_s, m_exact))
        dt = time.time() - t0
        tag = " <= DEFAULT (2χ+32)" if s == default_s else (
            " (full rank)" if s == 10 ** 6 else "")
        print(f"[rank_curve] sketch rank {s:>7}: d={d_s:.3e}  "
              f"ratio d/d_norm={d_s / max(d_norm, 1e-300):.3f}  "
              f"({dt:.1f}s){tag}", flush=True)
        rows.append({
            "D": D, "N": N, "chi": chi, "chi_hi": chi_hi, "seed": args.seed,
            "path": "sketch", "rank": s, "distance": d_s,
            "ratio_vs_ordinary": d_s / max(d_norm, 1e-300),
            "seconds": round(dt, 2),
        })
    os.environ.pop("KPBP_BLOB_LIMIT", None)
    os.environ.pop("KPBP_SKETCH_RANK", None)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    print(f"[rank_curve] {len(rows)} rows appended to {args.out}", flush=True)


if __name__ == "__main__":
    main()
