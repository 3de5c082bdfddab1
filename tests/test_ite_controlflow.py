"""ITE control-flow parity: mode ordering, BP hardening, segment rollback,
tracker history/revert/offline-load, and the AFM-T annealing field protocol
(reference: main.py:200,299,676; _ite_tracker.py:64-162; run_ite.py:29-41)."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagomeperiodicbp_tpu.algo.bp import BPConfig, BPStats
from kagomeperiodicbp_tpu.algo import ite as I
from kagomeperiodicbp_tpu.enums import UpdateMode
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.physics import hamiltonians


def test_mode_order_no_immediate_repeats():
    cfg = I.ITEConfig(num_mode_repetitions_per_segment=50)
    rng = random.Random(0)
    last = None
    for _ in range(10):
        order = I._mode_order(cfg, last, rng)
        assert len(order) == 50
        seq = ([last] if last is not None else []) + order
        assert all(a != b for a, b in zip(seq, seq[1:]))
        last = order[-1]


def test_mode_order_deterministic_when_not_random():
    cfg = I.ITEConfig(num_mode_repetitions_per_segment=6, random_mode_order=False)
    order = I._mode_order(cfg, None, random.Random(0))
    assert order == [UpdateMode(i % 3) for i in range(6)]


def test_harden_bp_config_if_struggled():
    import logging

    log = logging.getLogger("t")
    base = BPConfig(trunc_dim=8)
    # success → unchanged
    ok = BPStats(success=True, final_config=BPConfig(trunc_dim=50))
    cfg, chi = I._harden_bp_config_if_struggled(base, 18, ok, log)
    assert cfg.trunc_dim == 8 and chi == 18
    # failure with escalated config → adopt trunc_dim; chi widens when passed
    bad = BPStats(success=False, final_config=BPConfig(trunc_dim=19))
    cfg, chi = I._harden_bp_config_if_struggled(base, 18, bad, log)
    assert cfg.trunc_dim == 19
    assert chi == int(19 * 1.33)
    # failure below current chi → trunc_dim adopted, chi kept
    mild = BPStats(success=False, final_config=BPConfig(trunc_dim=12))
    cfg, chi = I._harden_bp_config_if_struggled(base, 18, mild, log)
    assert cfg.trunc_dim == 12 and chi == 18


def test_harden_bp_config_respects_cap():
    """Hardening must clamp the adopted χ to trunc_dim_cap: it runs once per
    edge update (~55×/segment), so a persistently-failing BP (e.g. error
    floored at the c64 precision limit) otherwise compounds ×1.5 escalation
    into χ ~ thousands within one segment (observed: 2 h XLA wedge at D=2)."""
    import logging

    log = logging.getLogger("t")
    base = BPConfig(trunc_dim=8, trunc_dim_cap=32)
    cfg, chi = base, 18
    for _ in range(60):  # one segment's worth of always-failing edge updates
        escalated = BPStats(
            success=False, final_config=BPConfig(trunc_dim=int(cfg.trunc_dim * 2.5) + 1)
        )
        cfg, chi = I._harden_bp_config_if_struggled(cfg, chi, escalated, log)
    assert cfg.trunc_dim <= 32
    assert chi <= int(32 * 1.33)


def test_full_ite_seeds_trunc_dim_cap(monkeypatch):
    """full_ite must install a default χ ceiling (4× trunc_dim) so per-edge
    hardening is bounded even for user-supplied BPConfigs without one."""
    captured = {}

    def fake_robust_bp(cell, messages, bp_cfg, N):
        captured["cfg"] = bp_cfg
        raise I.ITEError("stop here")  # abort the segment immediately

    monkeypatch.setattr(I, "robust_belief_propagation", fake_robust_bp)
    cfg = I.ITEConfig(
        hamiltonian=hamiltonians.heisenberg_afm,
        time_steps=[1e-3],
        num_total_errors_threshold=1,  # first error aborts the run
        seed=0,
    )
    with pytest.raises(I.ITEError):
        I.full_ite(_tiny_cell(), cfg, N=2, D=2, bp_config=BPConfig(trunc_dim=8))
    assert captured["cfg"].trunc_dim_cap == 32


def test_robust_bp_escalation_capped_and_plateau_stops(monkeypatch):
    """Deterministic wrapper-logic test with a fake `belief_propagation`:
    (a) a plateaued error (escalation not helping → precision-limited) stops
    the retry ladder early; (b) the returned messages are the BEST attempt's,
    not the (random-init) last attempt's; (c) χ never exceeds the cap even
    when every attempt improves enough to keep retrying."""
    from kagomeperiodicbp_tpu.algo import bp as bpmod

    calls = []

    def make_fake(errors):
        it = iter(errors)

        def fake_bp(cell, msgs_in, cfg, N):
            err = next(it)
            calls.append(cfg.trunc_dim)
            stats = bpmod.BPStats(success=False, final_error=err)
            return {"attempt": len(calls), "err": err}, stats

        return fake_bp

    # (a)+(b): attempt 2 barely improves (>0.7× of best) → plateau after 2
    monkeypatch.setattr(bpmod, "belief_propagation", make_fake([1e-4, 9e-5, 1e-9]))
    cfg = BPConfig(trunc_dim=8, allowed_retries=5)
    msgs, stats = bpmod.robust_belief_propagation(None, None, cfg, N=2)
    assert len(calls) == 2          # plateau stopped the ladder
    assert msgs["err"] == 9e-5      # best attempt returned (attempt 2, barely better)
    assert stats.final_error == 9e-5

    # (c): steadily-improving errors keep the ladder going, but χ is capped
    calls.clear()
    monkeypatch.setattr(
        bpmod, "belief_propagation", make_fake([1e-1, 1e-2, 1e-3, 1e-4, 1e-5, 1e-6])
    )
    cfg = BPConfig(trunc_dim=8, trunc_dim_cap=21, allowed_retries=5)
    msgs, stats = bpmod.robust_belief_propagation(None, None, cfg, N=2)
    assert calls == [8, 13, 20, 21]  # ×1.5 ladder clamped at the cap, then stop
    assert msgs["err"] == 1e-4       # best (= last improving) attempt returned
    assert stats.final_config.trunc_dim <= 21


def _tiny_cell(seed=0, D=2):
    return UnitCell.random(D=D, d=2, key=jax.random.PRNGKey(seed))


def test_tracker_history_revert_and_load(tmp_path):
    path = str(tmp_path / "tracker.pkl")
    tr = I.ITETracker(checkpoint_path=path, history_limit=3)

    class FakeMeas:
        def __init__(self, e):
            self.mean_energy = e

    cells = [_tiny_cell(s) for s in range(5)]
    for s, c in enumerate(cells):
        tr.log_segment(1e-2, c, FakeMeas(-0.1 * s), I.ITESegmentStats(delta_t=1e-2))

    assert len(tr.energies) == 5
    assert len(tr.cells) == 3  # bounded by history_limit
    assert tr.best_energy == pytest.approx(-0.4)

    # revert drops the last segment and returns the cell as of the new head
    cell = tr.revert_back(1)
    assert len(tr.energies) == 4
    np.testing.assert_allclose(
        np.asarray(jnp.real(cell.A)), np.real(tr.cells[-1]["A"]), atol=1e-12
    )

    # offline recovery from the checkpoint written at the last log_segment
    tr2 = I.ITETracker.load(path)
    assert tr2.best_energy == pytest.approx(-0.4)
    assert tr2.best_cell is not None
    assert len(tr2.energies) == 5  # checkpoint predates the revert


def test_revert_back_beyond_history_raises():
    tr = I.ITETracker(history_limit=2)

    class FakeMeas:
        mean_energy = -1.0

    for s in range(3):
        tr.log_segment(1e-2, _tiny_cell(s), FakeMeas(), I.ITESegmentStats())
    with pytest.raises(ValueError):
        tr.revert_back(2)  # only 2 cells retained; need 3 to revert 2


def test_decreasing_global_field_protocol():
    f = hamiltonians.DecreasingGlobalField()
    # measurement query does not advance the decay and reads 0
    assert f(None) == 0.0
    v1 = f(1e-3)
    assert v1 == pytest.approx(1e-2 * 0.93)
    v2 = f(1e-3)
    assert v2 == pytest.approx(v1 * 0.93)
    # faster decay below 1e-5
    v3 = f(1e-6)
    assert v3 == pytest.approx(v2 * 0.90)
    # clamps to exactly zero eventually
    for _ in range(500):
        f(1e-6)
    assert f(1e-6) == 0.0
    assert f(None) == 0.0


def test_field_hamiltonian_matches_bare_at_zero():
    h0 = hamiltonians.heisenberg_afm()
    hf = hamiltonians.heisenberg_afm_with_field(0.0)
    np.testing.assert_allclose(h0, hf)
    hb = hamiltonians.heisenberg_afm_with_field(0.3)
    assert np.abs(hb - h0).max() > 1e-3


def test_full_ite_rolls_back_on_segment_error(monkeypatch):
    """A segment whose edge update raises ITEError must leave the cell at the
    pre-segment state (reference main.py:676-683 semantics)."""
    calls = {"n": 0}

    def exploding_update(cell, messages, N, chi, chi_msg, edge, h, dt, config):
        calls["n"] += 1
        raise I.ITEError("boom")

    monkeypatch.setattr(I, "ite_update_edge", exploding_update)

    cell0 = _tiny_cell(0)
    cfg = I.ITEConfig(
        hamiltonian=hamiltonians.heisenberg_afm,
        time_steps=[1e-2],
        num_mode_repetitions_per_segment=1,
        num_edge_repetitions_per_mode=1,
        add_gaussian_noise_fraction=0.5,  # would visibly change the cell
        randomly_rotate_unit_cell_between_segments=False,
        bp_every_edge=False,
        num_total_errors_threshold=10,
    )
    best, cell_out, tracker = I.full_ite(
        cell0, cfg, N=2, D=2, chi=12, bp_config=BPConfig(trunc_dim=8),
        measure_every_segment=False,
    )
    assert calls["n"] == 1
    assert tracker.error_count == 1
    # rolled back: noise was applied inside the failed segment, but the
    # surviving cell is bit-identical to the input
    np.testing.assert_array_equal(np.asarray(cell_out.A), np.asarray(cell0.A))


def test_measure_every_thins_measurements():
    """measure_every=K measures every K-th segment plus each dt-block end."""
    cfg = I.ITEConfig(
        hamiltonian=hamiltonians.heisenberg_afm,
        time_steps=[1e-2] * 5 + [1e-3] * 2,
        num_mode_repetitions_per_segment=1,
        num_edge_repetitions_per_mode=1,
        symmetric_second_order_trotterization=False,
        randomly_rotate_unit_cell_between_segments=False,
        bp_every_edge=False,
    )
    from kagomeperiodicbp_tpu.algo.bp import BPConfig as BC

    _best, _cell, tracker = I.full_ite(
        _tiny_cell(0), cfg, N=2, D=2, chi=12, bp_config=BC(trunc_dim=8),
        measure_every=3,
    )
    # segments 0, 3, 6 (every 3rd) + 4 (end of the 1e-2 block); 6 is also
    # the final block end → 4 measurements
    assert len(tracker.energies) == 4


def test_pad_to_preserves_state_exactly():
    """Zero-noise pad: the embedded TN contracts to the identical value."""
    from kagomeperiodicbp_tpu.algo import contraction as C

    cell = _tiny_cell(0)
    padded = cell.pad_to(3, noise_fraction=0.0)
    assert padded.D == 3 and padded.A.shape == (2, 3, 3, 3, 3)
    # dense-oracle contraction of both networks (exact, cheap at N=2)
    from kagomeperiodicbp_tpu.lattices import BlockSide
    from kagomeperiodicbp_tpu.ops import exact
    from kagomeperiodicbp_tpu.planner.compiler import sweep_order

    def dense_value(c, D):
        msgs = C.initial_messages(2, D, chi=10**6, model="uniform")
        graph = C._graph_for(2, D, 10**6, tuple(int(s) for s in BlockSide))
        fused = [np.asarray(t) for t in C.fused_cells(c)]

        def fetch(src):
            if src[0] == "lat":
                return fused[src[1] % 3]
            _, side, k = src
            return np.asarray(msgs[BlockSide(side)].sites[k])

        env, ol = exact.contract_dense(graph, fetch, sweep_order(graph, BlockSide.U))
        assert not ol
        return complex(env)

    v2 = dense_value(cell, 2)
    v3 = dense_value(padded, 3)
    # uniform messages are vec(I_D)/sqrt(D): the padded TN picks up a known
    # sqrt(3/2) factor per boundary-leg message normalisation — compare the
    # normalised values
    import math
    n_legs = 6 * 3  # 6 sides x 3 boundary sites at N=2
    np.testing.assert_allclose(v3 * math.sqrt(3 / 2) ** n_legs, v2, rtol=1e-9)
    # noise=default produces a nearby but different state
    noisy = cell.pad_to(3)
    assert float(jnp.linalg.norm(noisy.A - padded.A)) > 1e-4


def test_pad_to_rejects_shrinking():
    cell = _tiny_cell(0, D=3)
    with pytest.raises(ValueError):
        cell.pad_to(2)
