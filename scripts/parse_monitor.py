#!/usr/bin/env python
"""Summarise / plot a ProcessMonitor log (`run_ite.py --monitor`).

(reference: /root/reference/scripts/plot/performance_logged.py — parses the
psutil sampler lines back out of a run log and plots CPU/RAM over time)

Usage:
    python scripts/parse_monitor.py data/runs/D3/monitor.log [--plot out.png]
"""
from __future__ import annotations

import argparse
import re
import sys

LINE = re.compile(
    r"^(?P<t>\d\d:\d\d:\d\d)(?:\s+cpu=(?P<cpu>[\d.]+)%)?(?:\s+rss=(?P<rss>[\d.]+)GB)?"
)


def parse(path: str):
    times, cpu, rss = [], [], []
    with open(path) as fh:
        for line in fh:
            m = LINE.match(line.strip())
            if not m:
                continue
            times.append(m.group("t"))
            if m.group("cpu") is not None:
                cpu.append(float(m.group("cpu")))
            if m.group("rss") is not None:
                rss.append(float(m.group("rss")))
    return times, cpu, rss


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log")
    p.add_argument("--plot", default=None, help="write a CPU/RSS PNG here")
    args = p.parse_args(argv)

    times, cpu, rss = parse(args.log)
    if not times:
        print("no monitor samples found", file=sys.stderr)
        return 1
    print(f"samples: {len(times)}  span: {times[0]}..{times[-1]}")
    if cpu:
        print(f"cpu%%:  mean={sum(cpu)/len(cpu):.1f}  max={max(cpu):.1f}")
    if rss:
        print(f"rssGB: mean={sum(rss)/len(rss):.2f}  max={max(rss):.2f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax1 = plt.subplots(figsize=(9, 4))
        x = range(len(times))
        if cpu:
            ax1.plot(x, cpu, color="tab:blue", lw=0.8)
            ax1.set_ylabel("CPU %", color="tab:blue")
        if rss:
            ax2 = ax1.twinx()
            ax2.plot(range(len(rss)), rss, color="tab:red", lw=0.8)
            ax2.set_ylabel("RSS GB", color="tab:red")
        ax1.set_xlabel("sample")
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"wrote {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
