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
from ..physics import metrics, pauli
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


def sandwich_expectation(
    cell: UnitCell,
    messages: MessageDict,
    N: int,
    chi: int,
    chi_msg: int,
    operator: np.ndarray,
    flavor: int = 0,
    force_real: bool = False,
    _shared=None,
):
    """⟨op⟩ at a central site of `flavor` by fully contracting the operator
    sandwich — the reference's `_sandwich_with_operator_and_contract_fully` +
    `_calc_and_check_expectation_value` path (measurements.py:419-519):
    numerator = TN with the site's double-layer tensor replaced by the
    ket–op–bra sandwich, denominator = the plain TN norm, both with
    mantissa/log separation so the ratio never under/overflows. The message
    log-scales cancel in the ratio. Independent of the RDM path — used to
    cross-check it (tests/test_measurements_sandwich.py).

    `_shared`: internal cache from `_sandwich_shared` so batch callers
    (measure_xyz_sandwich) compute the denominator/fused tensors once."""
    from ..networks.unit_cell import fused_tensor_with_operator
    from ..ops.contract import execute_plan
    from ..utils.jaxtools import to_complex_scalar

    sh = _shared or _sandwich_shared(cell, messages, N, chi, chi_msg)
    plan, graph, fused, msg_sites, den = (
        sh["plan"], sh["graph"], sh["fused"], sh["msg_sites"], sh["den"]
    )

    lat_nodes = [n for n in graph.nodes if n.source[0] == "lat"]
    mine = [n for n in lat_nodes if n.source[1] % 3 == flavor % 3]
    cx = np.mean([n.pos for n in lat_nodes], axis=0)
    node = min(mine, key=lambda n: (n.pos[0] - cx[0]) ** 2 + (n.pos[1] - cx[1]) ** 2)
    target_idx = node.source[1]

    t = (cell.A, cell.B, cell.C)[flavor % 3]
    f_op = fused_tensor_with_operator(t, operator)

    def fetch(source):
        if source[0] == "lat":
            if source[1] == target_idx:
                return f_op
            return fused[source[1] % 3]
        _, side, k = source
        return msg_sites[side][k]

    num_m, num_l = execute_plan(plan, fetch)
    den_m, den_l = den
    ratio = to_complex_scalar(num_m) / to_complex_scalar(den_m)
    val = ratio * float(np.exp(float(num_l - den_l)))
    return float(val.real) if force_real else val


def _sandwich_shared(cell, messages, N, chi, chi_msg):
    """Plan/graph/fused tensors + the (operator-independent) denominator,
    computed once per (cell, messages) for a batch of sandwich calls."""
    from ..lattices import BlockSide
    from ..ops.contract import execute_plan
    from . import contraction as C

    D = cell.D
    plan = C.full_scalar_plan(N, D, chi, chi_msg)
    graph = C._graph_for(N, D, chi_msg, tuple(int(s) for s in BlockSide))
    fused = C.fused_cells(cell)
    msg_sites = {int(s): tuple(m.sites) for s, m in messages.items()}
    den = execute_plan(plan, C._make_fetch(fused, msg_sites))
    return {"plan": plan, "graph": graph, "fused": fused,
            "msg_sites": msg_sites, "den": den}


def measure_xyz_sandwich(
    cell: UnitCell, messages: MessageDict, N: int, chi: int, chi_msg: int
) -> Dict[str, Dict[str, complex]]:
    """Per-flavor ⟨x/y/z⟩ via the full-sandwich path (reference:
    measurements.py:579 `measure_xyz` uses the sandwich per core node).
    One denominator contraction serves all 9 numerators."""
    shared = _sandwich_shared(cell, messages, N, chi, chi_msg)
    out: Dict[str, Dict[str, complex]] = {}
    for f, name in enumerate("ABC"):
        out[name] = {
            k: sandwich_expectation(cell, messages, N, chi, chi_msg,
                                    pauli.ALL[k], f, _shared=shared)
            for k in "xyz"
        }
    return out


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
