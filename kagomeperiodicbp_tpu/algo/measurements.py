"""Energy + observable measurements on a unit cell via per-edge RDMs.

(reference: /root/reference/src/algo/measurements.py:163
`measure_energies_and_observables_together`)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from ..enums import UpdateEdge
from ..networks.unit_cell import UnitCell
from ..ops import ite_kernels as K
from ..physics import metrics, pauli
from . import edge_env as E
from .contraction import MessageDict


@dataclass
class MeasurementsOnUnitCell:
    """(reference: containers/results.py:8)"""

    energies: Dict[str, float] = field(default_factory=dict)
    expectations: Dict[str, Dict[str, float]] = field(default_factory=dict)
    entanglement: Dict[str, float] = field(default_factory=dict)

    @property
    def mean_energy(self) -> float:
        """Energy per site: Σ over the 6 edge classes / 3 sites
        (reference: results.py:14)."""
        return float(sum(self.energies.values()) / 3.0)


def expectation_values_with_rdm(rho: np.ndarray) -> Dict[str, tuple]:
    """Per-site ⟨x/y/z⟩ from the 2-site RDM's partial traces
    (reference: measurements.py:522)."""
    res = {}
    rho_i = np.einsum("iIjj->iI", rho)
    rho_j = np.einsum("iijJ->jJ", rho)
    for name, op in pauli.ALL.items():
        vi = complex(np.einsum("iI,Ii->", rho_i, op))
        vj = complex(np.einsum("jJ,Jj->", rho_j, op))
        res[name] = (vi, vj)
    return res


def measure_energies_and_observables(
    cell: UnitCell,
    messages: MessageDict,
    N: int,
    chi: int,
    chi_msg: int,
    h: np.ndarray,
    force_real: bool = True,
) -> MeasurementsOnUnitCell:
    from . import fused as F
    import jax.numpy as jnp

    out = MeasurementsOnUnitCell()
    acc = {f: {k: [] for k in "xyz"} for f in "ABC"}
    dtype = cell.A.dtype
    h_j = jnp.asarray(
        np.real(h) if not jnp.issubdtype(dtype, jnp.complexfloating) else h, dtype
    )
    cells = tuple(cell._tensors) if hasattr(cell, "_tensors") else (cell.A, cell.B, cell.C)
    msg_sites = F._msgs_to_sites(messages)

    from ..utils.jaxtools import to_complex_scalar

    for edge in UpdateEdge.all_options():
        measure = F.edge_measure(N, cell.D, chi, chi_msg, edge)
        energy, neg, exps = measure(cells, msg_sites, h_j)
        e = to_complex_scalar(energy)
        key = str(edge)
        out.energies[key] = float(e.real) if force_real else e
        out.entanglement[key] = float(neg)
        f1, f2 = edge.first.name, edge.second.name
        for k, (vi, vj) in exps.items():
            vi, vj = to_complex_scalar(vi), to_complex_scalar(vj)
            acc[f1][k].append(vi.real if force_real else vi)
            acc[f2][k].append(vj.real if force_real else vj)

    out.expectations = {
        f: {k: float(np.mean(v)) for k, v in kv.items()} for f, kv in acc.items()
    }
    return out
