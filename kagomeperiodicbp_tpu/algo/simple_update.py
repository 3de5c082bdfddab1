"""Simple-update (SU) imaginary-time evolution on the Kagome unit cell.

The mean-field bootstrap that replaces the reference's vendored `tnsu`
package (/root/reference/src/libs/tnsu/simple_update.py:10 and
src/unit_cell/get_from/_simple_update.py): environments are approximated by
diagonal λ weights on each of the 6 edge classes of the 3-site cell.

Each site has 4 virtual legs and each leg belongs to exactly one edge class,
so the infinite Kagome lattice's SU closes on (A, B, C) + 6 λ vectors:

  class (f1, f2) joins leg_of(f1, dir) with leg_of(f2, dir.opposite()).

Used to produce good starting unit cells for the full BlockBP+ITE
optimisation (reference: run_ite.py `unit_cell_from="tnsu"`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import UpdateEdge
from ..lattices.kagome import NODE_KIND_DIRS
from ..utils.jaxtools import to_numpy as _to_numpy
from ..networks.unit_cell import UnitCell
from ..ops.ite_kernels import gate_from_hamiltonian

EdgeKey = Tuple[int, int]  # (flavor1, flavor2) ints


def _leg_of(flavor: int, d) -> int:
    return NODE_KIND_DIRS[flavor].index(d)


def edge_classes() -> List[Tuple[UpdateEdge, int, int]]:
    """[(edge, leg1, leg2)] for the 6 classes; leg indices are virtual-leg
    positions (0..3) on the first/second tensor."""
    res = []
    for e in UpdateEdge.all_options():
        d = e.direction()
        res.append((e, _leg_of(int(e.first), d), _leg_of(int(e.second), d.opposite())))
    return res


def _move_leg_front(t: jnp.ndarray, leg: int) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """[d, v0..v3] → [d, v_leg, rest...]; returns inverse permutation."""
    order = (0, leg + 1) + tuple(i + 1 for i in range(4) if i != leg)
    inv = np.argsort(order)
    return jnp.transpose(t, order), tuple(int(i) for i in inv)


def _absorb_lambdas(t, flavor: int, lambdas, skip_leg: int, classes):
    """Multiply each virtual leg of tensor `t` (flavor) by its edge-class λ,
    except `skip_leg`."""
    for e, l1, l2 in classes:
        key = (int(e.first), int(e.second))
        if int(e.first) == flavor and l1 != skip_leg:
            lam = lambdas[key]
            t = jnp.moveaxis(jnp.moveaxis(t, l1 + 1, -1) * lam, -1, l1 + 1)
        if int(e.second) == flavor and l2 != skip_leg:
            lam = lambdas[key]
            t = jnp.moveaxis(jnp.moveaxis(t, l2 + 1, -1) * lam, -1, l2 + 1)
    return t


def simple_update(
    h: np.ndarray,
    D: int,
    d: int = 2,
    time_steps: List[float] | None = None,
    cell: UnitCell | None = None,
    dtype=jnp.complex128,
    key=None,
    tol: float = 1e-10,
) -> Tuple[UnitCell, Dict[EdgeKey, jnp.ndarray]]:
    """Run SU until the λ spectra stop moving (per dt), return the cell with
    λs absorbed symmetrically (√λ on each side) — the standard SU→PEPS form.
    """
    if time_steps is None:
        time_steps = [0.1] * 200 + [0.01] * 200 + [1e-3] * 200 + [1e-4] * 100
    if cell is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        cell = UnitCell.random(d=d, D=D, key=key, dtype=dtype)
    classes = edge_classes()
    lambdas: Dict[EdgeKey, jnp.ndarray] = {
        (int(e.first), int(e.second)): jnp.ones(D, dtype=jnp.zeros((), dtype).real.dtype)
        for e, _, _ in classes
    }
    tensors = {0: cell.A.astype(dtype), 1: cell.B.astype(dtype), 2: cell.C.astype(dtype)}

    h_j = jnp.asarray(h)
    lam_keys = sorted(lambdas)

    def sweep(tensors3, lams, g):
        """One full SU sweep over the 6 edge classes — traced into a single
        XLA program (per-op eager dispatch made D≥3 warm starts take tens of
        minutes on one core; one compiled program per sweep is ~50× fewer
        dispatches)."""
        tns = {i: tensors3[i] for i in range(3)}
        lms = dict(zip(lam_keys, lams))
        for e, l1, l2 in classes:
            f1, f2 = int(e.first), int(e.second)
            key2 = (f1, f2)
            t1 = _absorb_lambdas(tns[f1], f1, lms, l1, classes)
            t2 = _absorb_lambdas(tns[f2], f2, lms, l2, classes)
            lam = lms[key2]
            t1m, inv1 = _move_leg_front(t1, l1)
            t2m, inv2 = _move_leg_front(t2, l2)
            # θ[i, rest1, j, rest2] with λ on the shared bond
            theta = jnp.einsum("iexyz,e,jeuvw->ixyzjuvw", t1m, lam.astype(dtype), t2m)
            sh1 = t1m.shape[2:]
            sh2 = t2m.shape[2:]
            # apply the gate: θ'[i r1 j r2] = Σ g[i,I,j,J] θ[I r1 J r2]
            th = jnp.einsum("iIjJ,IabcJuvw->iabcjuvw", g, theta)
            m = th.reshape(d * int(np.prod(sh1)), d * int(np.prod(sh2)))
            u, s, vh = jnp.linalg.svd(m, full_matrices=False)
            k = min(D, s.shape[0])
            u, s, vh = u[:, :k], s[:k], vh[:k, :]
            s = s / jnp.linalg.norm(s)
            new_lam = jnp.maximum(s, 1e-15)
            t1n = u.reshape((d,) + tuple(sh1) + (k,))
            t1n = jnp.moveaxis(t1n, -1, 1)  # [d, k, rest1]
            t2n = vh.reshape((k, d) + tuple(sh2))
            t2n = jnp.moveaxis(t2n, 0, 1)  # [d, k, rest2]
            # remove the previously-absorbed λs (divide) and restore leg order
            t1n = jnp.transpose(t1n, inv1)
            t2n = jnp.transpose(t2n, inv2)
            inv_l = {k2: 1.0 / v for k2, v in lms.items()}
            t1n = _absorb_lambdas(t1n, f1, inv_l, l1, classes)
            t2n = _absorb_lambdas(t2n, f2, inv_l, l2, classes)
            tns[f1] = t1n / jnp.linalg.norm(t1n)
            tns[f2] = t2n / jnp.linalg.norm(t2n)
            lms[key2] = new_lam
        spectra = jnp.concatenate([lms[k2] for k2 in lam_keys])
        return (tns[0], tns[1], tns[2]), tuple(lms[k2] for k2 in lam_keys), spectra

    from ..utils.jaxtools import resilient_jit

    sweep_j = resilient_jit(sweep)

    # group the ladder into (dt, count) blocks; converged blocks exit early
    blocks: List[Tuple[float, int]] = []
    for dt in time_steps:
        if blocks and blocks[-1][0] == dt:
            blocks[-1] = (dt, blocks[-1][1] + 1)
        else:
            blocks.append((dt, 1))

    tensors3 = (tensors[0], tensors[1], tensors[2])
    lams = tuple(lambdas[k2] for k2 in lam_keys)
    for dt, count in blocks:
        g = gate_from_hamiltonian(h_j, dt)
        prev_spectra = None
        for _ in range(count):
            tensors3, lams, spectra = sweep_j(tensors3, lams, g)
            # convergence per dt block (device→host via to_numpy: the axon
            # backend raises UNIMPLEMENTED on some direct float() transfers)
            if prev_spectra is not None and float(
                np.linalg.norm(_to_numpy(spectra - prev_spectra))
            ) < tol:
                break
            prev_spectra = spectra
    tensors = {0: tensors3[0], 1: tensors3[1], 2: tensors3[2]}
    lambdas = dict(zip(lam_keys, lams))

    # absorb √λ symmetrically into the tensors
    sqrt_lam = {k2: jnp.sqrt(v) for k2, v in lambdas.items()}
    out = {}
    for f in range(3):
        out[f] = _absorb_lambdas(tensors[f], f, sqrt_lam, skip_leg=-1, classes=classes)
        out[f] = out[f] / jnp.linalg.norm(out[f])
    uc = UnitCell(out[0], out[1], out[2])
    return uc, lambdas
