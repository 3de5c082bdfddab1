"""χ-sharded boundary-MPS contraction vs the single-device executor.

The missing SURVEY §5 component (round-3 VERDICT #42): the frontier bond
dimension of ONE contraction laid over a mesh axis, GSPMD partitioning the
swallow tensordots. Equivalence target 1e-6 per the verdict; f64 on the
virtual CPU mesh actually agrees to ~1e-10 (collective reduction reorder is
the only source of drift).
"""
import jax
import numpy as np
import pytest

import jax.numpy as jnp

from kagomeperiodicbp_tpu.algo import contraction as C
from kagomeperiodicbp_tpu.lattices import BlockSide
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.ops import mps as mpslib
from kagomeperiodicbp_tpu.parallel import chi_shard as CS

DTYPE = jnp.complex128


def _setup(N, D, chi, seed=0):
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(seed), dtype=DTYPE)
    msgs = C.initial_messages(N, D, chi, model="random",
                              key=jax.random.PRNGKey(7 + seed), dtype=DTYPE)
    return cell, msgs


def test_chi_mesh_shape():
    mesh = CS.chi_mesh(n_devices=4)
    assert mesh.shape == {"chi": 4}


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_message_matches_single_device(n_dev):
    N, D, chi = 2, 2, 8
    cell, msgs = _setup(N, D, chi)
    mesh = CS.chi_mesh(n_devices=n_dev)
    for toward in (BlockSide(0), BlockSide(2)):
        ref = C.outgoing_message(cell, msgs, N, D, chi, chi, toward)
        got = CS.outgoing_message_sharded(cell, msgs, N, D, chi, chi,
                                          toward, mesh)
        assert float(mpslib.distance(got, ref)) < 1e-10


def test_sharded_sweep_converges_with_unsharded_fixed_point():
    """A full χ-sharded BP sweep applied at the UNSHARDED fixed point must be
    a no-op (the two executors compute the same message map)."""
    from kagomeperiodicbp_tpu.algo import bp as BP
    from kagomeperiodicbp_tpu.config import BPConfig

    N, D, chi = 2, 2, 8
    cell, msgs = _setup(N, D, chi, seed=3)
    # hermitize_when_finished=False: the final hermitization projects the
    # returned messages ~1e-4 off the raw fixed point (measured), which
    # would mask what this test checks — that the sharded sweep map has the
    # same fixed point as the unsharded one.
    cfg = BPConfig(trunc_dim=chi, max_iterations=40,
                   msg_diff_terminate=1e-12, hermitize_when_finished=False,
                   dtype=DTYPE)
    conv, stats = BP.belief_propagation(cell, msgs, cfg, N)
    assert stats.final_error < 1e-10

    mesh = CS.chi_mesh(n_devices=4)
    new_msgs, err = CS.bp_sweep_sharded(cell, conv, N, D, chi, chi, mesh)
    assert err < 1e-9


def test_sharded_output_really_sharded():
    """The jitted sharded program must actually lay big frontier bonds over
    the mesh (not silently replicate everything): check the compiled
    program's HLO contains collectives or sharded ops by inspecting the
    output sharding of an intermediate-capturing variant."""
    N, D, chi = 2, 3, 18
    cell, msgs = _setup(N, D, chi, seed=1)
    mesh = CS.chi_mesh(n_devices=2)

    plan = C.to_message_plan(N, D, chi, chi, 0)
    fused = C.fused_cells(cell)
    msg_sites = {int(s): tuple(m.sites) for s, m in msgs.items() if int(s) != 0}

    constrain = CS.site_sharder(mesh)

    from kagomeperiodicbp_tpu.ops import contract as X

    def run(fused, msg_sites):
        fetch = C._make_fetch(fused, msg_sites)
        with X.site_constraint(constrain):
            out = X.execute_plan(plan, fetch)
        return out.sites

    lowered = jax.jit(run).lower(fused, msg_sites)
    hlo = lowered.as_text()
    assert "sharding" in hlo  # constraints made it into the program
