#!/usr/bin/env python
"""Dump the Kagome block's edge list (node pairs per edge, boundary legs per
side) as JSON — for external tools and cross-implementation comparisons.

(reference: /root/reference/scripts/create_kagome_elists.py)
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-N", type=int, default=2)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from kagomeperiodicbp_tpu.lattices import BlockSide, KagomeBlock

    block = KagomeBlock.build(args.N)
    edges = []
    for v in range(block.n_nodes):
        for leg in range(4):
            n = int(block.neighbors[v, leg])
            if n > v:
                edges.append([v, n])
    boundary = {
        BlockSide(s).name: [[int(v), int(leg)] for v, leg in block.boundary_legs(BlockSide(s))]
        for s in range(6)
    }
    data = {
        "N": args.N,
        "n_nodes": block.n_nodes,
        "flavors": [int(k) for k in block.kinds],
        "edges": edges,
        "boundary_legs": boundary,
    }
    text = json.dumps(data, indent=1)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text)
        print(f"wrote {args.out}")
    else:
        print(text)


if __name__ == "__main__":
    main()
