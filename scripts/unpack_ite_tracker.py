#!/usr/bin/env python
"""Recover the best unit cell (and the energy history) from a saved
ITETracker checkpoint.

(reference: /root/reference/scripts/unpack_ite_tracker.py:9)
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("tracker", help="path to tracker .pkl")
    p.add_argument("--out", default=None, help="where to save the recovered unit cell")
    args = p.parse_args(argv)

    with open(args.tracker, "rb") as fh:
        data = pickle.load(fh)
    print(f"segments: {len(data['energies'])}")
    print(f"best energy/site: {data['best_energy']}")
    if data["energies"]:
        print(f"last 5 energies: {data['energies'][-5:]}")
    if args.out and data.get("best_cell") is not None:
        import jax.numpy as jnp

        from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell

        c = data["best_cell"]
        cell = UnitCell(jnp.asarray(c["A"]), jnp.asarray(c["B"]), jnp.asarray(c["C"]))
        cell.save(args.out)
        print(f"unit cell saved to {args.out}")


if __name__ == "__main__":
    main()
