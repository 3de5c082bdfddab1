"""Multi-device tests on the 8-virtual-device CPU mesh (conftest).

Validates the TPU-native distribution story (SURVEY §5): the 6 BP messages
as a sharded rotation batch (`side` mesh axis) and independent chains as a
`dp` axis, against the single-device paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagomeperiodicbp_tpu.algo import batched as B
from kagomeperiodicbp_tpu.algo import contraction as C
from kagomeperiodicbp_tpu.algo import fused as F
from kagomeperiodicbp_tpu.enums import UnitCellFlavor, UpdateEdge
from kagomeperiodicbp_tpu.lattices import BlockSide
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.ops import mps as mpslib
from kagomeperiodicbp_tpu.parallel import multichip as MC
from kagomeperiodicbp_tpu.physics.hamiltonians import heisenberg_afm

N, D, CHI = 2, 2, 8
DTYPE = jnp.complex128


def _setup(seed=0):
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(seed), dtype=DTYPE)
    msgs = C.initial_messages(N, D, CHI, model="random",
                              key=jax.random.PRNGKey(100 + seed), dtype=DTYPE)
    return cell, msgs


def _state_dist(sites_a, sites_b):
    """Max MPS state distance across sides (gauge-invariant comparison)."""
    return max(
        float(mpslib.distance(mpslib.from_sites(list(sites_a[k])),
                              mpslib.from_sites(list(sites_b[k]))))
        for k in sites_a
    )


def test_batched_step_equals_per_side():
    """One batched (single-dispatch) BP sweep == six per-side programs."""
    cell, msgs = _setup()
    fused = C.fused_cells(cell)
    sites = F._msgs_to_sites(msgs)
    s_seq, e_seq = F.bp_iteration(N, D, CHI, CHI, None)(fused, sites)
    s_bat, e_bat = B.bp_iteration_batched(N, D, CHI, CHI, None)(fused, sites)
    assert abs(float(e_seq) - float(e_bat)) < 1e-12
    assert _state_dist(s_seq, s_bat) < 1e-12


def test_batched_trajectory_converges_identically():
    cell, msgs = _setup(1)
    fused = C.fused_cells(cell)
    s_seq = s_bat = F._msgs_to_sites(msgs)
    step_seq = F.bp_iteration(N, D, CHI, CHI, None)
    step_bat = B.bp_iteration_batched(N, D, CHI, CHI, None)
    for _ in range(12):
        s_seq, e_seq = step_seq(fused, s_seq)
        s_bat, e_bat = step_bat(fused, s_bat)
    assert _state_dist(s_seq, s_bat) < 1e-10
    assert abs(float(e_seq) - float(e_bat)) < 1e-10


def test_batched_damping_is_data():
    """Changing the damping value must not recompile (same program id)."""
    cell, msgs = _setup(2)
    fused = C.fused_cells(cell)
    sites = F._msgs_to_sites(msgs)
    step = B.bp_iteration_batched(N, D, CHI, CHI, 0.3)
    s1, e1 = step(fused, sites)
    s2, e2 = step(fused, sites, damping_value=0.7)
    # more damping ⇒ closer to the old messages ⇒ smaller update distance on
    # the *next* sweep
    assert abs(float(e1) - float(e2)) > 0 or _state_dist(s1, s2) > 0
    # damping is traced data: both calls must share ONE compiled program
    prog = B.bp_step_program(N, D, CHI, CHI, damped=True)  # lru_cache → same
    assert prog._state["jitted"]._cache_size() == 1


@pytest.mark.skipif(len(jax.devices()) < 6, reason="needs 6 devices")
def test_side_sharded_bp_matches_single_device():
    """BP sweep with the rotation batch sharded over a 3-device `side` axis
    equals the unsharded batched sweep."""
    cell, msgs = _setup(3)
    fused = C.fused_cells(cell)
    sites = F._msgs_to_sites(msgs)

    mesh = MC.make_mesh(n_devices=6)
    assert dict(mesh.shape) == {"dp": 2, "side": 3}
    step_sharded = MC.sharded_bp_step(N, D, CHI, CHI, mesh)
    step_plain = B.bp_step_program(N, D, CHI, CHI, False)

    zero = jnp.zeros((), jnp.float64)
    s_sh, e_sh = step_sharded(fused, sites, zero)
    s_pl, e_pl = step_plain(fused, sites, zero)
    assert abs(float(e_sh) - float(e_pl)) < 1e-12
    assert _state_dist(s_sh, s_pl) < 1e-12


@pytest.mark.skipif(len(jax.devices()) < 6, reason="needs 6 devices")
def test_multichain_dp_side_step():
    """(dp=2, side=3) mesh: 2 independent chains, each a full sharded BP
    sweep + edge energy; per-chain results equal the single-chain path."""
    mesh = MC.make_mesh(n_devices=6)
    n_chains = mesh.shape["dp"]
    cells = [_setup(10 + i)[0] for i in range(n_chains)]
    msgs = C.initial_messages(N, D, CHI, model="uniform", dtype=DTYPE)
    sites = F._msgs_to_sites(msgs)

    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = NamedSharding(mesh, P("dp"))
    cells_batch = tuple(
        jax.device_put(jnp.stack([c[f] for c in cells]), dp) for f in "ABC"
    )
    msg_batch = {
        k: tuple(jax.device_put(jnp.broadcast_to(x, (n_chains,) + x.shape), dp)
                 for x in v)
        for k, v in sites.items()
    }
    h = jnp.asarray(heisenberg_afm(), DTYPE)
    edge = UpdateEdge(UnitCellFlavor.B, UnitCellFlavor.C)

    step = MC.multichain_bp_energy_step(N, D, CHI, CHI, mesh, edge)
    new_msgs, errs, energies, mean_e = step(cells_batch, msg_batch, h)

    # reference: single-chain unsharded path per chain
    for i, cell in enumerate(cells):
        fused = C.fused_cells(cell)
        s1, e1 = B.bp_iteration_batched(N, D, CHI, CHI, None)(fused, sites)
        assert abs(float(errs[i]) - float(e1)) < 1e-10
        t1, t2, env, _ = F._edge_env_traced(
            (cell.A, cell.B, cell.C), s1, N, CHI, CHI, edge
        )
        from kagomeperiodicbp_tpu.ops import ite_kernels as K

        rho = K.rho_ij(t1, t2, env)
        e_ref = float(jnp.real(jnp.einsum("iIjJ,iIjJ->", rho, h)))
        assert abs(float(energies[i]) - e_ref) < 1e-9
    assert abs(float(mean_e) - float(np.mean([float(e) for e in energies]))) < 1e-12


def test_dryrun_multichip_inprocess():
    """The driver-invoked entry runs on the conftest 8-device CPU platform
    without the bootstrap subprocess."""
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)
