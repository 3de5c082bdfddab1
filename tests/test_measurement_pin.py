"""Pin the PRODUCTION measurement path (VERDICT r2 weak #10).

Every published physics record is produced by exactly this procedure
(algo/ite.py full_ite measurement block): zero-rotation cell, fresh robust
BP at `BPConfig(2D²).for_measurements(2)`, block N+1, contraction χ×2,
`measure_energies_and_observables`.  This test re-runs it on a committed
D=3 cell (tests/assets/pin_D3.pkl) and asserts the golden value
(tests/assets/pin_D3.json, written by tools/make_measurement_pin.py via the
same path) to 1e-9 — any contraction/BP/measurement change that shifts the
records' meaning fails here.

(reference analog: the best-store filenames ARE the measurement output,
src/unit_cell/definition.py save path + measurements convention
main.py:133-151)
"""
import json
import os
import sys

import pytest

ASSETS = os.path.join(os.path.dirname(__file__), "assets")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_production_measurement_is_pinned():
    golden_path = os.path.join(ASSETS, "pin_D3.json")
    if not os.path.exists(golden_path):
        pytest.skip("golden file missing — run tools/make_measurement_pin.py")
    with open(golden_path) as fh:
        golden = json.load(fh)

    from tools.make_measurement_pin import production_measurement

    got = production_measurement(os.path.join(ASSETS, "pin_D3.pkl"))
    assert got["N"] == golden["N"] and got["chi"] == golden["chi"]
    assert abs(got["mean_energy"] - golden["mean_energy"]) < 1e-9, (
        f"production measurement drifted: {got['mean_energy']!r} vs "
        f"golden {golden['mean_energy']!r}"
    )
    for k, v in golden["edge_energies"].items():
        assert abs(got["edge_energies"][k] - v) < 1e-9
