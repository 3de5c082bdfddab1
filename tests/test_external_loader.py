"""The foreign-tensor-set loader (scripts/load_external_su.py).

Fast checks only: the stub unpickler must extract tensors/dims/energy from a
tnsu-format pickle without importing any foreign code, and the monitor-log
parser must round-trip ProcessMonitor lines.  The full cross-measurement
runs via `python scripts/load_external_su.py --all` (results in
BENCHMARKS.md).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TNSU_DIR = "/root/reference/data/simple_update_results"


@pytest.mark.skipif(not os.path.isdir(TNSU_DIR), reason="no reference data")
def test_load_tnsu_single_cell():
    from scripts.load_external_su import load_tnsu

    data = load_tnsu(os.path.join(TNSU_DIR, "tnsu_AFH_D=3_size=1_PBC.dat"))
    assert data["D"] == 3
    assert len(data["tensors"]) == 3
    for t in data["tensors"]:
        assert t.shape == (2, 3, 3, 3, 3)
        assert np.isfinite(np.asarray(t)).all()
    # size=1 sets carry no final_energy; size>=2 sets do
    data2 = load_tnsu(os.path.join(TNSU_DIR, "tnsu_AFH_D=2_size=2_PBC.dat"))
    assert data2["final_energy"] is not None and data2["final_energy"] < 0
    assert len(data2["tensors"]) == 21


def test_parse_monitor_roundtrip(tmp_path):
    from scripts.parse_monitor import parse

    p = tmp_path / "monitor.log"
    p.write_text("12:00:01 cpu=93.5% rss=1.25GB\n12:00:11 cpu=88.0% rss=1.30GB\n")
    times, cpu, rss = parse(str(p))
    assert times == ["12:00:01", "12:00:11"]
    assert cpu == [93.5, 88.0]
    assert rss == [1.25, 1.30]
