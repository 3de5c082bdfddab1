#!/usr/bin/env python
"""Summarize the axon weather + poisoning time series into the policy table.

Reads logs/chip/weather.jsonl (tools/probe_weather.py via weather_watch) and
logs/chip/poison_series.jsonl (tools/probe_poison_boundary.py samples) and
prints:

1. the weather-class timeline (when did the backend change state),
2. per-program success rates — split into eager-dispatch vs jax.jit
   programs, the round-3 question (is poisoning dispatch-path-dependent?),
3. a markdown table ready for BENCHMARKS.md.

Usage: python tools/weather_report.py [--md]
"""
import argparse
import json
import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_jsonl(path):
    out = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        out.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    except FileNotFoundError:
        pass
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--md", action="store_true", help="markdown output")
    args = p.parse_args()

    weather = load_jsonl(os.path.join(ROOT, "logs/chip/weather.jsonl"))
    series = [r for r in load_jsonl(os.path.join(ROOT, "logs/chip/poison_series.jsonl"))
              if "program" in r]

    # 1. timeline: compress consecutive identical classes
    timeline = []
    for rec in weather:
        cls = rec.get("class", "?")
        if not timeline or timeline[-1][1] != cls:
            timeline.append((rec.get("t", "?"), cls))
    print("== weather timeline ==")
    for t, cls in timeline:
        print(f"  {t}  {cls}")

    # 2. per-program rates
    stats = defaultdict(lambda: [0, 0])  # program -> [ok, total]
    for rec in series:
        s = stats[rec["program"]]
        s[1] += 1
        if rec["verdict"] == "ok":
            s[0] += 1

    if not stats:
        print("\n(no poison-series samples yet)")
        return

    print("\n== per-program success rates ==")
    rows = []
    for prog in sorted(stats, key=lambda x: (not x.startswith("eager"), x)):
        ok, tot = stats[prog]
        path = "eager" if prog.startswith("eager") else "jit"
        rows.append((prog, path, ok, tot, 100.0 * ok / tot))
    if args.md:
        print("| program | dispatch | ok/total | rate |")
        print("|---|---|---|---|")
        for prog, path, ok, tot, rate in rows:
            print(f"| {prog} | {path} | {ok}/{tot} | {rate:.0f}% |")
    else:
        for prog, path, ok, tot, rate in rows:
            print(f"  {prog:28s} {path:6s} {ok:3d}/{tot:<3d} {rate:5.1f}%")

    eager = [r for r in rows if r[1] == "eager"]
    jit = [r for r in rows if r[1] == "jit"]
    if eager and jit:
        e_rate = sum(r[2] for r in eager) / max(1, sum(r[3] for r in eager))
        j_rate = sum(r[2] for r in jit) / max(1, sum(r[3] for r in jit))
        print(f"\n  aggregate: eager {100*e_rate:.0f}%  vs  jit {100*j_rate:.0f}%"
              f"  (n={sum(r[3] for r in eager)}/{sum(r[3] for r in jit)})")


if __name__ == "__main__":
    sys.exit(main())
