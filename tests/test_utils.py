"""Utility-layer tests: sweep runner, best store, tracker roundtrip,
operator helpers, decorators."""
import os

import numpy as np
import pytest

from kagomeperiodicbp_tpu.parallel.sweep import SweepPoint, grid, run_sweep
from kagomeperiodicbp_tpu.physics import operators, pauli
from kagomeperiodicbp_tpu.utils.best_store import load_best, save_if_best
from kagomeperiodicbp_tpu.utils.csvs import CSVManager
from kagomeperiodicbp_tpu.utils.decorators import Stats, add_stats, multiple_tries


def test_sweep_runner(tmp_path):
    points = grid(Ds=(2, 3), seeds=(0, 1))
    assert len(points) == 4

    def worker(pt: SweepPoint):
        if pt.D == 3 and pt.seed == 1:
            raise ValueError("boom")
        return {"val": pt.D * 10 + pt.seed}

    csv = str(tmp_path / "res.csv")
    results = run_sweep(points, worker, csv_path=csv)
    rows = CSVManager(csv, []).read()
    assert len(rows) == 4
    assert sum(1 for r in rows if r["status"] == "ok") == 3
    assert any("error" in r["status"] for r in rows)


def test_best_store(tmp_path):
    import jax

    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell

    folder = str(tmp_path / "best")
    cell = UnitCell.random(d=2, D=2, key=jax.random.PRNGKey(0))
    assert save_if_best(cell, -0.30, 2, folder)
    assert not save_if_best(cell, -0.25, 2, folder)  # worse → not saved
    assert save_if_best(cell, -0.35, 2, folder)
    got = load_best(2, folder)
    assert got is not None and got[1] == -0.35


def test_tracker_roundtrip(tmp_path):
    import jax

    from kagomeperiodicbp_tpu.algo.ite import ITESegmentStats, ITETracker
    from kagomeperiodicbp_tpu.algo.measurements import MeasurementsOnUnitCell
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell

    path = str(tmp_path / "t.pkl")
    tr = ITETracker(checkpoint_path=path)
    cell = UnitCell.random(d=2, D=2, key=jax.random.PRNGKey(1))
    meas = MeasurementsOnUnitCell(energies={"(A,B)": -0.9})
    tr.log_segment(0.1, cell, meas, ITESegmentStats())
    assert os.path.exists(path)
    import pickle

    with open(path, "rb") as fh:
        data = pickle.load(fh)
    assert data["best_energy"] == meas.mean_energy
    assert data["best_cell"]["A"].shape == (2, 2, 2, 2, 2)


def test_operator_helpers():
    h = np.tensordot(pauli.x, pauli.z, 0)  # [k1,b1,k2,b2]
    m = operators.op_to_mat(h)
    assert m.shape == (4, 4)
    np.testing.assert_allclose(m, np.kron(pauli.x, pauli.z))
    back = operators.mat_to_op(m, (2, 2))
    np.testing.assert_allclose(back, h)
    np.testing.assert_allclose(operators.op_dagger(h), h)  # hermitian
    assert abs(operators.op_trace(h)) < 1e-12
    assert abs(operators.op_norm(h) - 1.0) < 1e-12


def test_decorators():
    calls = {"n": 0}

    @multiple_tries(3)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("try again")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3

    class R:
        stats = Stats()

    @add_stats()
    def work():
        return R()

    out = work()
    assert out.stats.execution_time > 0


def test_resilient_jit_eager_fallback(monkeypatch):
    """When every compile is poisoned (persistent UNIMPLEMENTED), the wrapper
    must switch to eager execution and still produce the right answer."""
    import jax

    from kagomeperiodicbp_tpu.utils import jaxtools

    calls = {"jit": 0}

    def poisoned_jit(fn, **kw):
        calls["jit"] += 1

        def bad(*a, **k):
            raise RuntimeError("UNIMPLEMENTED: TPU backend error (test)")

        return bad

    monkeypatch.setattr(jax, "jit", poisoned_jit)
    monkeypatch.setenv("KPBP_JIT_RETRIES", "2")
    before = len(jaxtools.EAGER_EVENTS)
    wrapped = jaxtools.resilient_jit(lambda x: x * 2)
    assert wrapped(21) == 42          # fell back to eager
    assert calls["jit"] == 3          # initial + 2 retries
    assert len(jaxtools.EAGER_EVENTS) == before + 1
    assert wrapped(5) == 10           # stays eager, no further jit attempts
    assert calls["jit"] == 3


def test_resilient_jit_fallback_can_be_disabled(monkeypatch):
    import jax

    from kagomeperiodicbp_tpu.utils import jaxtools

    monkeypatch.setattr(jax, "jit", lambda fn, **kw: (lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("UNIMPLEMENTED: nope"))))
    monkeypatch.setenv("KPBP_JIT_RETRIES", "1")
    monkeypatch.setenv("KPBP_EAGER_FALLBACK", "0")
    wrapped = jaxtools.resilient_jit(lambda x: x + 1)
    with pytest.raises(RuntimeError):
        wrapped(1)


def test_degraded_tier_retries_poisoned_eager_ops(monkeypatch):
    """Round-3 weather: even eager per-op executables flake UNIMPLEMENTED.
    The degraded tier must evict caches and retry instead of dying."""
    import jax

    from kagomeperiodicbp_tpu.utils import jaxtools

    monkeypatch.setattr(jax, "jit", lambda fn, **kw: (lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("UNIMPLEMENTED: jit poisoned"))))
    monkeypatch.setenv("KPBP_JIT_RETRIES", "0")
    monkeypatch.setenv("KPBP_EAGER_RETRIES", "2")

    calls = {"n": 0, "cleared": 0}
    monkeypatch.setattr(jax, "clear_caches", lambda: calls.__setitem__("cleared", calls["cleared"] + 1))

    def flaky_eager(x):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNIMPLEMENTED: eager poisoned")
        return x + 1

    wrapped = jaxtools.resilient_jit(lambda x: x + 1, fallback=flaky_eager)
    assert wrapped(1) == 2
    assert calls["n"] == 3
    assert calls["cleared"] == 2     # one eviction per failed eager attempt

    # a genuine (non-backend) error must NOT be retried
    def broken(x):
        raise ValueError("real bug")

    wrapped2 = jaxtools.resilient_jit(lambda x: x, fallback=broken)
    with pytest.raises(ValueError):
        wrapped2(1)


def test_cache_clear_forces_revalidation():
    """ADVICE r3: after any wrapper evicts the process-wide executable cache,
    every OTHER validated wrapper must re-probe its (recompiled) program on
    next use instead of trusting the stale validated flag."""
    from kagomeperiodicbp_tpu.utils import jaxtools

    wrapped = jaxtools.resilient_jit(lambda x: x + 1)
    assert int(wrapped(1)) == 2
    st = wrapped._state
    assert st["validated"] and st["generation"] == jaxtools._CACHE_GENERATION

    jaxtools._CACHE_GENERATION += 1          # what _run_degraded does after clear_caches()
    assert int(wrapped(2)) == 3              # must re-probe, not skip validation
    assert st["generation"] == jaxtools._CACHE_GENERATION


def test_transfer_timeout_is_poisoned_class():
    """TransferTimeout must count as a poisoned-program signal so hung
    device→host copies trigger the same recovery ladder as UNIMPLEMENTED."""
    from kagomeperiodicbp_tpu.utils.jaxtools import TransferTimeout, _poisoned

    assert _poisoned(TransferTimeout("hung"))
    assert _poisoned(RuntimeError("UNIMPLEMENTED: TPU backend error"))
    assert not _poisoned(ValueError("shape mismatch"))


def test_guarded_wait_passthrough_off_axon():
    """On healthy backends guarded_wait is a plain call (no thread)."""
    from kagomeperiodicbp_tpu.utils import jaxtools

    assert jaxtools.guarded_wait(lambda: 7) == 7


def test_guarded_wait_times_out(monkeypatch):
    import time

    from kagomeperiodicbp_tpu.utils import jaxtools

    monkeypatch.setattr(jaxtools, "on_axon", lambda: True)
    with pytest.raises(jaxtools.TransferTimeout):
        jaxtools.guarded_wait(lambda: time.sleep(5), timeout=0.2)
    # errors inside the worker thread are relayed verbatim
    def boom():
        raise KeyError("inner")

    with pytest.raises(KeyError):
        jaxtools.guarded_wait(boom, timeout=5)


def test_host_float_and_scalar_transfers():
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.utils.jaxtools import host_float, to_complex_scalar

    assert host_float(jnp.full((), 2.5)) == 2.5
    assert host_float(4) == 4.0
    assert to_complex_scalar(jnp.asarray(1.0 + 2.0j)) == 1 + 2j
