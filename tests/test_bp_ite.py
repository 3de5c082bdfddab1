"""BP fixed point + ITE physics tests.

The product-state checks are *exact*: |↑…↑⟩ is a BP fixed point with rank-1
messages, so every measured quantity has a closed-form value — this validates
the whole pipeline (BP → sandwich env → RDM → measurement) end to end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagomeperiodicbp_tpu.algo import contraction as C
from kagomeperiodicbp_tpu.algo.bp import BPConfig, belief_propagation, robust_belief_propagation
from kagomeperiodicbp_tpu.algo.ite import ITEConfig, full_ite, ite_update_edge
from kagomeperiodicbp_tpu.algo.measurements import measure_energies_and_observables
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.physics import hamiltonians

N, D = 2, 2


def test_bp_on_product_state_and_exact_measurements():
    cell = UnitCell.zero_product_state(d=2, D=D)
    cfg = BPConfig(trunc_dim=8, max_iterations=30, msg_diff_terminate=1e-12)
    msgs, stats = belief_propagation(cell, None, cfg, N)
    assert stats.final_error < 1e-8, f"BP did not converge: {stats.error_history}"

    h = hamiltonians.heisenberg_afm()
    meas = measure_energies_and_observables(cell, msgs, N, chi=18, chi_msg=8, h=h)
    # |↑↑⟩ per edge: ⟨S·S⟩ = ⟨SzSz⟩ = 1/4; per site = 6·(1/4)/3 = 1/2
    for key, e in meas.energies.items():
        assert abs(e - 0.25) < 1e-8, f"edge {key}: {e}"
    assert abs(meas.mean_energy - 0.5) < 1e-8
    for f in "ABC":
        assert abs(meas.expectations[f]["z"] - 1.0) < 1e-8
        assert abs(meas.expectations[f]["x"]) < 1e-8
    for key, neg in meas.entanglement.items():
        assert neg < 1e-8  # product state: no entanglement


def test_bp_converges_random_cell():
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(42))
    cfg = BPConfig(trunc_dim=8, max_iterations=40, msg_diff_terminate=1e-11)
    msgs, stats = robust_belief_propagation(cell, None, cfg, N)
    assert stats.success, f"BP failed: err={stats.final_error}"
    assert stats.final_error < 1e-5


def test_ite_lowers_energy():
    """A few big-dt ITE steps from random must push the AFM energy down."""
    cfg = ITEConfig(
        hamiltonian=hamiltonians.heisenberg_afm,
        time_steps=[0.5] * 3 + [0.2] * 2,
        bp_every_edge=False,
        random_edge_order=False,
        symmetric_second_order_trotterization=False,
        als_iterations=4,
        seed=7,
    )
    bp_cfg = BPConfig(trunc_dim=8, max_iterations=20, msg_diff_terminate=1e-9,
                      msg_diff_good_enough=1e-3)
    best, cell, tracker = full_ite(
        None, cfg, N=N, D=D, chi=18, bp_config=bp_cfg,
    )
    assert len(tracker.energies) == 5
    # energy must decrease monotonically toward the AFM ground state (≈−0.42)
    assert tracker.energies[-1] < tracker.energies[0] + 1e-9
    assert tracker.best_energy < -0.15, f"energies: {tracker.energies}"
