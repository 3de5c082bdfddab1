"""Arbitrary (non-repeated) Kagome blocks: per-site tensors, BP, and
lattice-shift-averaged measurements.

(reference: `KagomeTNArbitrary`, tensor_network.py:400/489 and
`calc_measurement_non_unit_cell_kagome_tn`, measurements.py:245 — used for
cross-implementation validation of externally-produced tensor sets,
scripts/tests/su_itai_vs_roy/)

The same compiled plans serve arbitrary blocks: the tensor fetchers index
``fused[v % len(fused)]``, so passing 3 tensors tiles a unit cell and
passing ``3·n_triangles`` tensors binds every site individually.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import UpdateEdge
from ..lattices import KagomeBlock, LatticeDir, triangle
from ..networks.unit_cell import UnitCell
from .bp import BPConfig, robust_belief_propagation
from .measurements import MeasurementsOnUnitCell, measure_energies_and_observables


def kagome_shift_permutation(N: int, d: LatticeDir) -> List[int]:
    """Kagome-node permutation for a one-step periodic shift of the block:
    node 3t+k → 3·σ(t)+k with σ the triangle-lattice shift
    (reference: triangle.py:1020, tensor_network.py:489)."""
    tri_perm = triangle.periodic_shift_permutation(N, d)
    out = []
    for t in range(triangle.total_vertices(N)):
        for k in range(3):
            out.append(3 * tri_perm[t] + k)
    return out


def all_shift_permutations(N: int) -> List[List[int]]:
    """All |triangles| distinct periodic shifts (identity included) —
    every way of centring the block (reference: triangle.py:1138)."""
    nt = triangle.total_vertices(N)
    base_r = kagome_shift_permutation(N, LatticeDir.R)
    base_dr = kagome_shift_permutation(N, LatticeDir.DR)

    def compose(p, q):  # apply q after p
        return [q[x] for x in p]

    perms = []
    seen = set()
    # generate the translation group by composing R and DR shifts
    frontier = [list(range(3 * nt))]
    while frontier:
        p = frontier.pop()
        key = tuple(p)
        if key in seen:
            continue
        seen.add(key)
        perms.append(p)
        frontier.append(compose(p, base_r))
        frontier.append(compose(p, base_dr))
    assert len(perms) == nt, f"expected {nt} shifts, got {len(perms)}"
    return perms


class ArbitraryKagomeTN:
    """A size-N block with an individual ket tensor per site."""

    def __init__(self, tensors: Sequence[jnp.ndarray], N: int):
        block = KagomeBlock.build(N)
        assert len(tensors) == block.n_nodes, (
            f"need {block.n_nodes} tensors for N={N}, got {len(tensors)}"
        )
        self.N = N
        self.block = block
        self.tensors = list(tensors)

    @staticmethod
    def from_unit_cell(cell: UnitCell, N: int) -> "ArbitraryKagomeTN":
        block = KagomeBlock.build(N)
        flavors = ("A", "B", "C")
        return ArbitraryKagomeTN([cell[flavors[v % 3]] for v in range(block.n_nodes)], N)

    def shifted(self, perm: List[int]) -> "ArbitraryKagomeTN":
        """Tensors moved by a periodic-shift permutation (node v's tensor
        moves to perm[v])."""
        new = [None] * len(self.tensors)
        for v, t in enumerate(self.tensors):
            new[perm[v]] = t
        return ArbitraryKagomeTN(new, self.N)  # type: ignore[arg-type]

    def as_cell_view(self) -> "_PerSiteCellView":
        """A pseudo unit cell whose 'tensors' are the full per-site list —
        duck-types UnitCell for every driver whose fetchers index
        ``fused[v % len(fused)]`` (BP, measurements, plans)."""
        return _PerSiteCellView(self.tensors)

    def measure(
        self,
        h: np.ndarray,
        bp_config: BPConfig | None = None,
        chi: int | None = None,
        average_shifts: bool = False,
    ) -> MeasurementsOnUnitCell:
        """BP + per-edge measurements; optionally averaged over every
        periodic shift of the block (reference measurements.py:245-321)."""
        D = int(self.tensors[0].shape[1])
        bp_config = bp_config or BPConfig(trunc_dim=2 * D * D, dtype=self.tensors[0].dtype)
        chi = chi or 2 * D * D + 10

        tns = [self]
        if average_shifts:
            tns = [self.shifted(p) for p in all_shift_permutations(self.N)]

        results = []
        for tn in tns:
            holder = tn.as_cell_view()
            msgs, stats = robust_belief_propagation(holder, None, bp_config, self.N)
            meas = measure_energies_and_observables(
                holder, msgs, self.N, chi, bp_config.trunc_dim, h
            )
            results.append(meas)

        if len(results) == 1:
            return results[0]
        out = MeasurementsOnUnitCell()
        for key in results[0].energies:
            out.energies[key] = float(np.mean([r.energies[key] for r in results]))
            out.entanglement[key] = float(np.mean([r.entanglement[key] for r in results]))
        out.expectations = {
            f: {
                k: float(np.mean([r.expectations[f][k] for r in results]))
                for k in "xyz"
            }
            for f in "ABC"
        }
        return out


class _PerSiteCellView:
    """Duck-types UnitCell for the BP/measurement drivers, carrying one
    tensor per site. `fused_cells`/edge fetchers index mod len → per-site."""

    def __init__(self, tensors: Sequence[jnp.ndarray]):
        self._tensors = list(tensors)
        self.rotated = 0

    @property
    def A(self):
        return self._tensors[0]

    @property
    def B(self):
        return self._tensors[1]

    @property
    def C(self):
        return self._tensors[2]

    @property
    def D(self) -> int:
        return int(self._tensors[0].shape[1])

    def __getitem__(self, key: str):
        return {"A": self._tensors[0], "B": self._tensors[1], "C": self._tensors[2]}[key]

    def items(self):
        yield from zip("ABC", self._tensors[:3])
