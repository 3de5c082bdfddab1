"""Geometry tests: Kagome block structure vs. analytically known counts and
reference invariants (SURVEY.md §2.2)."""
import math

import numpy as np
import pytest

from kagomeperiodicbp_tpu.lattices import BlockSide, KagomeBlock, LatticeDir, triangle
from kagomeperiodicbp_tpu.lattices.kagome import num_message_sites


@pytest.mark.parametrize("N", [2, 3, 4, 5])
def test_counts(N):
    block = KagomeBlock.build(N)
    assert block.n_nodes == 3 * (3 * N * N - 3 * N + 1)
    # every open leg is tagged with exactly one side/rank; 6 sides × (2N−1)
    open_legs = (block.neighbors == -1).sum()
    assert open_legs == 6 * num_message_sites(N)


@pytest.mark.parametrize("N", [2, 3, 4])
def test_edges_reciprocal(N):
    block = KagomeBlock.build(N)
    for v in range(block.n_nodes):
        for leg in range(4):
            n = block.neighbors[v, leg]
            if n < 0:
                continue
            back = block.neighbor_legs[v, leg]
            assert block.neighbors[n, back] == v
            assert block.neighbor_legs[n, back] == leg
            # directions must be opposite
            d1 = block.node_dirs(v)[leg]
            d2 = block.node_dirs(n)[back]
            assert d1.opposite() == d2
            # positions consistent with direction (angle match)
            delta = block.positions[n] - block.positions[v]
            ang = math.atan2(delta[1], delta[0]) % (2 * math.pi)
            assert abs(((ang - d1.angle + math.pi) % (2 * math.pi)) - math.pi) < 1e-6


@pytest.mark.parametrize("N", [2, 3, 4])
def test_boundary_structure(N):
    block = KagomeBlock.build(N)
    for side in BlockSide:
        legs = block.boundary_legs(side)
        assert len(legs) == 2 * N - 1
        # sorted ccw: projections on orthogonal_ccw strictly increase
        u = np.array(side.orthogonal_ccw().unit)
        # the outer-edge midpoints (node pos + half leg direction):
        proj = []
        for v, leg in legs:
            d = block.node_dirs(v)[leg]
            p = block.positions[v] + 0.5 * np.array(d.unit)
            proj.append(float(p @ u))
        assert all(proj[i] < proj[i + 1] + 1e-9 for i in range(len(proj) - 1))
        # boundary node counts (reference kagome.py:402-408)
        nodes = block.boundary_nodes(side)
        if side in (BlockSide.U, BlockSide.DR, BlockSide.DL):
            assert len(nodes) == N
        else:
            assert len(nodes) == 2 * N


@pytest.mark.parametrize("N", [2, 3, 4])
def test_rows_cover_all(N):
    block = KagomeBlock.build(N)
    for side in BlockSide:
        rows = block.nodes_rows_in_direction(side)
        flat = [v for row in rows for v in row]
        assert sorted(flat) == list(range(block.n_nodes))


@pytest.mark.parametrize("N", [2, 3, 4])
def test_core_nodes(N):
    block = KagomeBlock.build(N)
    core = block.core_nodes()
    assert len(core) == 9
    center = block.center_nodes()
    assert all(c in core for c in center)
    # around-core are neighbours of the centre triangle
    for v in block.around_core_nodes():
        assert any(block.neighbors[v, leg] in center for leg in range(4))
    # flavors: node v has flavor v%3 (A=up, B=left, C=right);
    # core must contain 3 of each
    flavors = [v % 3 for v in core]
    assert flavors.count(0) == flavors.count(1) == flavors.count(2) == 3


def test_triangle_neighbors_match_positions():
    N = 4
    pos = triangle.all_positions(N)
    for v in range(triangle.total_vertices(N)):
        for n, d in triangle.all_neighbors(v, N):
            delta = pos[n] - pos[v]
            assert np.allclose(delta, 2.0 * np.array(d.unit), atol=1e-9)


def test_opposite_and_matching_dirs():
    for s in BlockSide:
        assert s.opposite().opposite() == s
        lo, hi = s.matching_lattice_dirs()
        # matching dirs straddle the face normal
        assert abs(((lo.angle - s.angle + math.pi) % (2 * math.pi)) - math.pi) < 1e-9 + math.pi / 6 + 1e-9
    # spot check reference tables (directions.py:256-272)
    assert BlockSide.U.orthogonal_ccw() == LatticeDir.L
    assert BlockSide.D.orthogonal_ccw() == LatticeDir.R
    assert BlockSide.U.matching_lattice_dirs() == (LatticeDir.UR, LatticeDir.UL)
    assert BlockSide.D.matching_lattice_dirs() == (LatticeDir.DL, LatticeDir.DR)
    assert BlockSide.DR.matching_lattice_dirs() == (LatticeDir.DR, LatticeDir.R)
