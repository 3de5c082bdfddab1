"""Sweep runner: grid construction, CSV recording, error capture, and the
process-pool concurrency mode (reference: scripts/condor/main_sender.py —
its `_local_test` mode spawns real local jobs)."""
import csv
import os

import pytest

from kagomeperiodicbp_tpu.parallel import sweep


def test_grid():
    pts = sweep.grid(Ds=(2, 3), seeds=(0, 1), method="bp")
    assert len(pts) == 4
    assert {p.D for p in pts} == {2, 3}
    assert all(p.method == "bp" for p in pts)


def test_run_sweep_sequential_records_failures(tmp_path):
    csv_path = str(tmp_path / "r.csv")

    def worker(pt):
        if pt.seed == 1:
            raise RuntimeError("bad point")
        return {"ok": pt.D}

    pts = sweep.grid(Ds=(2,), seeds=(0, 1, 2))
    res = sweep.run_sweep(pts, worker, csv_path=csv_path)
    assert len(res) == 3
    assert res[0] == {"ok": 2} and res[2] == {"ok": 2}
    assert "error" in res[1]

    with open(csv_path) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 3
    assert rows[0]["status"] == "ok"
    assert rows[1]["status"].startswith("error")


@pytest.mark.skipif(os.cpu_count() == 1 and os.environ.get("CI") == "1",
                    reason="pool overhead on 1 cpu in CI")
def test_run_sweep_concurrent_pool(tmp_path):
    """n_workers>1 really fans out to child processes (each child runs a
    jitted program on its pinned platform)."""
    csv_path = str(tmp_path / "r.csv")
    pts = sweep.grid(Ds=(2,), seeds=(0, 1, 2, 3))
    res = sweep.run_sweep(
        pts, sweep.smoke_worker, csv_path=csv_path,
        n_workers=2, child_platform="cpu",
    )
    assert len(res) == 4
    assert all(r.get("platform") == "cpu" for r in res)
    # result order matches point order despite completion order
    assert [r["seed"] for r in res] == [0, 1, 2, 3]
    with open(csv_path) as fh:
        rows = list(csv.DictReader(fh))
    assert all(r["status"] == "ok" for r in rows)
