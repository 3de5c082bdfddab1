"""EdgeTN environment + RDM validation against the exact dense oracle —
the "RDM match to 1e-10" acceptance criterion (SURVEY.md §4, mirroring the
reference's scripts/tests/bp.py exact-mode comparisons)."""
import jax
import numpy as np
import pytest

from kagomeperiodicbp_tpu.algo import contraction as C
from kagomeperiodicbp_tpu.algo import edge_env as E
from kagomeperiodicbp_tpu.enums import UpdateEdge
from kagomeperiodicbp_tpu.lattices import BlockSide, KagomeBlock
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.ops import exact, ite_kernels as K

# χ=256 is machine-exact for N=2, D=2 (true cut ranks ≤ 128 — verified by
# χ=128 vs 256 agreeing to 0.0) and keeps runtimes sane; 10**6 would skip all
# intermediate compressions and blow up mid-sweep tensors.  Messages are
# random rank-1 products (chi_msg=1): exactness is unaffected (the oracle
# uses the same messages) and both engine and oracle stay small.
BIG = 256
MSG_CHI = 1
N, D = 2, 2


def _setup(seed=0):
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(seed))
    msgs = C.initial_messages(N, D, chi=MSG_CHI, model="random", key=jax.random.PRNGKey(seed + 5))
    return cell, msgs


def _open_phys_fused(t):
    """T ⊗ T* with virtual ket-bra pairs fused but physical legs kept open:
    [d, D,D,D,D] → [D², D², D², D², d_ket, d_bra]."""
    t = np.asarray(t)
    d, Dv = t.shape[0], t.shape[1]
    tt = np.tensordot(t, np.conj(t), 0)  # [d, D*4, d*, D*4]
    tt = np.transpose(tt, (1, 6, 2, 7, 3, 8, 4, 9, 0, 5))
    return tt.reshape(Dv * Dv, Dv * Dv, Dv * Dv, Dv * Dv, d, d)


def _oracle_rho(cell, msgs, edge):
    """Exact ρ: sweep-contract the whole graph with the pair's physical legs
    kept open (small: 2×2 each) — no giant intermediate env."""
    block = KagomeBlock.build(N)
    graph = C._graph_for(N, D, MSG_CHI, tuple(int(s) for s in BlockSide))
    n1, n2 = E.edge_pair(block, edge)
    fused = [np.asarray(t) for t in C.fused_cells(cell)]

    def fetch(source):
        if source[0] == "lat":
            v = source[1]
            if v == n1 or v == n2:
                return _open_phys_fused(cell[("A", "B", "C")[v % 3]])
            return fused[v % 3]
        _, side, k = source
        return np.asarray(msgs[BlockSide(side)].sites[k])

    from kagomeperiodicbp_tpu.planner.compiler import sweep_order

    order = sweep_order(graph, BlockSide.U)
    env, open_legs = exact.contract_dense(graph, fetch, order)
    # remaining open legs = the pair's phys legs (4 and 5 of the open-fused)
    want = [(n1, 4), (n1, 5), (n2, 4), (n2, 5)]
    assert sorted(open_legs) == sorted(want), open_legs
    perm = [open_legs.index(w) for w in want]
    rho = np.transpose(env, perm)  # [i_ket, i_bra, j_ket, j_bra]
    return rho / np.trace(np.trace(rho, axis1=2, axis2=3))


@pytest.mark.parametrize("edge", UpdateEdge.all_options(), ids=str)
def test_edge_rdm_matches_oracle(edge):
    cell, msgs = _setup()
    t1, t2, env, perms = E.edge_environment(cell, msgs, N, chi=BIG, chi_msg=MSG_CHI, edge=edge)
    rho = np.asarray(K.rho_ij(t1, t2, env))
    rho_ex = _oracle_rho(cell, msgs, edge)
    np.testing.assert_allclose(rho, rho_ex, atol=1e-10)


def test_canonical_ket_permutation_roundtrip():
    cell, msgs = _setup()
    block = KagomeBlock.build(N)
    for edge in UpdateEdge.all_options():
        t1, t2, env, (p1, p2) = E.edge_environment(
            cell, msgs, N, chi=BIG, chi_msg=MSG_CHI, edge=edge
        )
        # permuting back must reproduce the cell tensor
        inv1 = [0] * 4
        for i, p in enumerate(p1):
            inv1[p] = i
        back = np.transpose(np.asarray(t1), (0,) + tuple(i + 1 for i in inv1))
        n1, _ = E.edge_pair(block, edge)
        np.testing.assert_allclose(back, np.asarray(cell[("A", "B", "C")[n1 % 3]]))
