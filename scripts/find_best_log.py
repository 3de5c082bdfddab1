#!/usr/bin/env python
"""Mine run logs + tracker checkpoints for the best energy per D.

(reference: /root/reference/scripts/find_best_log.py — scans the logs folder
for "Mean energy after segment" lines and reports the best log per D.)

This version understands both artifact kinds this repo produces:
  * run logs (``logs/*.log``) with ``energy/site=<v>`` lines, D parsed from
    the ``D=<n>`` in the filename or an in-log ``-D <n>`` echo;
  * tracker checkpoints (``data/**/tracker_D<n>_N<m>.pkl``) written by
    ITETracker.save.

Usage: python scripts/find_best_log.py [folders...]   (default: logs/ data/)
"""
from __future__ import annotations

import os
import pickle
import re
import sys
from dataclasses import dataclass
from typing import Dict, Iterable, Optional

_ENERGY_RE = re.compile(r"energy/site=(-?\d+\.\d+)")
_BEST_RE = re.compile(r"best=(-?\d+\.\d+)")
_D_RE = re.compile(r"D[=_]?(\d+)")


@dataclass
class LogRecord:
    D: int
    best_energy: float
    path: str
    segments: int = 0


def _scan_log(path: str) -> Optional[LogRecord]:
    m = _D_RE.search(os.path.basename(path))
    if not m:
        return None
    D = int(m.group(1))
    best = None
    n = 0
    with open(path, "r", errors="replace") as fh:
        for line in fh:
            em = _ENERGY_RE.search(line)
            if em:
                n += 1
                e = float(em.group(1))
                best = e if best is None else min(best, e)
            bm = _BEST_RE.search(line)  # running best=… lines count too
            if bm:
                e = float(bm.group(1))
                best = e if best is None else min(best, e)
    if best is None:
        return None
    return LogRecord(D=D, best_energy=best, path=path, segments=n)


def _scan_tracker(path: str) -> Optional[LogRecord]:
    m = _D_RE.search(os.path.basename(path))
    if not m:
        return None
    try:
        with open(path, "rb") as fh:
            data = pickle.load(fh)
        best = float(data["best_energy"])
        n = len(data.get("energies", []))
    except Exception:
        return None
    return LogRecord(D=int(m.group(1)), best_energy=best, path=path, segments=n)


def find_best_logs(folders: Iterable[str]) -> Dict[int, LogRecord]:
    best: Dict[int, LogRecord] = {}
    for folder in folders:
        for root, _dirs, files in os.walk(folder):
            for fn in files:
                path = os.path.join(root, fn)
                rec = None
                if fn.endswith(".log"):
                    rec = _scan_log(path)
                elif fn.endswith(".pkl") and "tracker" in fn:
                    rec = _scan_tracker(path)
                if rec is None:
                    continue
                cur = best.get(rec.D)
                if cur is None or rec.best_energy < cur.best_energy:
                    best[rec.D] = rec
    return best


def main(argv=None):
    folders = (argv or sys.argv[1:]) or ["logs", "data"]
    best = find_best_logs(folders)
    if not best:
        print("no logs with energies found")
        return best
    print("best runs per D:")
    for D in sorted(best):
        r = best[D]
        print(f"  D={D}: energy/site={r.best_energy:.10f}  ({r.segments} segments)  {r.path}")
    return best


if __name__ == "__main__":
    main()
