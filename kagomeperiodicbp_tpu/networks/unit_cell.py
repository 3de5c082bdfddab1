"""The 3-site unit cell (A=up, B=left, C=right of the upper triangle).

Tensor leg conventions (identical to the reference,
/root/reference/src/unit_cell/definition.py:26-40, forced by the node
leg-direction tables in lattices/kagome.py):

* A: [d, UL, DL, DR, UR]
* B: [d, L,  DL, R,  UR]
* C: [d, UL, L,  DR, R ]

``UnitCell`` is a JAX pytree so it can flow through jit'd programs.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FLAVORS = ("A", "B", "C")

# 120°-ccw rotation: the node arriving at each position and the permutation
# of its virtual legs into the canonical leg order of the new position.
# Derived from the direction tables: rotating all legs by +120° maps
#   up→left (perm [3,0,1,2]), left→right ([2,3,0,1]), right→up ([3,0,1,2]).
# (reference equivalent: unit_cell/definition.py:210-272 `rotate`)
_ROT_SRC = {"A": "C", "B": "A", "C": "B"}
_ROT_PERM = {"A": (3, 0, 1, 2), "B": (3, 0, 1, 2), "C": (2, 3, 0, 1)}


@jax.tree_util.register_pytree_node_class
@dataclass
class UnitCell:
    A: jnp.ndarray
    B: jnp.ndarray
    C: jnp.ndarray
    rotated: int = 0  # aux data: how many 120° rotations away from canonical

    # -- pytree protocol --
    def tree_flatten(self):
        return (self.A, self.B, self.C), self.rotated

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, rotated=aux)

    # -- access --
    def __getitem__(self, key: str) -> jnp.ndarray:
        return getattr(self, key)

    def items(self):
        for f in FLAVORS:
            yield f, getattr(self, f)

    @property
    def d(self) -> int:
        return self.A.shape[0]

    @property
    def D(self) -> int:
        return self.A.shape[1]

    def replace(self, **kw) -> "UnitCell":
        d = {f: getattr(self, f) for f in FLAVORS}
        d["rotated"] = self.rotated
        d.update(kw)
        return UnitCell(**d)

    # -- constructors --
    @staticmethod
    def random(d: int, D: int, key=None, dtype=jnp.complex128) -> "UnitCell":
        """iid gaussian tensors (reference: definition.py:93)."""
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        keys = jax.random.split(key, 6)
        shape = (d, D, D, D, D)

        def one(kr, ki):
            t = jax.random.normal(kr, shape)
            if jnp.issubdtype(dtype, jnp.complexfloating):
                t = t + 1j * jax.random.normal(ki, shape)
            t = t.astype(dtype)
            return t / jnp.linalg.norm(t)

        return UnitCell(one(keys[0], keys[1]), one(keys[2], keys[3]), one(keys[4], keys[5]))

    @staticmethod
    def random_product_state(d: int, D: int, key=None, dtype=jnp.complex128) -> "UnitCell":
        uc = UnitCell.random(d, D, key, dtype)
        return UnitCell(uc.A, uc.A, uc.A)

    @staticmethod
    def product_state_120(d: int, D: int, chirality: int = +1,
                          dtype=jnp.complex128) -> "UnitCell":
        """q=0 120° Néel order: spin-coherent product state with the three
        sublattice spins coplanar (xz-plane here; any plane is equivalent
        under the Heisenberg SU(2) symmetry) at mutual 120° angles — the
        classical order underlying the reference's best-store basins (the
        3-site periodic cell can only represent the q=0 member of the
        kagome 120° family).  chirality=±1 picks the A→B→C winding."""
        assert d == 2, "spin coherent states are defined for d=2"
        ts = []
        for k in range(3):
            alpha = chirality * 2.0 * np.pi / 3.0 * k
            t = np.zeros((d, D, D, D, D))
            t[0, 0, 0, 0, 0] = np.cos(alpha / 2.0)
            t[1, 0, 0, 0, 0] = np.sin(alpha / 2.0)
            ts.append(jnp.asarray(t, dtype))
        return UnitCell(*ts)

    @staticmethod
    def zero_product_state(d: int, D: int, dtype=jnp.complex128) -> "UnitCell":
        """|0…0⟩: tensor nonzero only at physical index 0, virtual (0,0,0,0)."""
        t = np.zeros((d, D, D, D, D))
        t[0, 0, 0, 0, 0] = 1.0
        t = jnp.asarray(t, dtype)
        return UnitCell(t, t, t)

    # -- transforms --
    def rotate_ccw(self) -> "UnitCell":
        """Rotate the state by 120° counterclockwise (lattice symmetry)."""
        new = {}
        for f in FLAVORS:
            src = getattr(self, _ROT_SRC[f])
            perm = (0,) + tuple(p + 1 for p in _ROT_PERM[f])
            new[f] = jnp.transpose(src, perm)
        return UnitCell(new["A"], new["B"], new["C"], rotated=(self.rotated + 1) % 3)

    def force_zero_rotation(self) -> "UnitCell":
        uc = self
        while uc.rotated % 3 != 0:
            uc = uc.rotate_ccw()
        return uc.replace(rotated=0)

    def pad_to(self, D: int, noise_fraction: float = 0.03, key=None) -> "UnitCell":
        """Embed into a larger bond dimension: zero-pad every virtual leg to
        `D` and add a noise kick so the new bond directions are live.
        The standard bond-dimension-annealing warm start: a converged D
        state seeds the D+1 optimization (no reference analog — their runs
        restart per D from random/best-of-same-D).

        `noise_fraction` must be large enough to make every bond genuinely
        full-rank: with near-zero weight in the padded directions the ALS
        environment metric is near-singular and a sweep of edge updates can
        silently destroy true-state weight the local environment cannot see
        (measured: 1e-3 noise collapses −0.395 → −0.10 within two sweeps;
        0.03–0.1 is stable and recovers the energy)."""
        if D < self.D:
            raise ValueError(f"pad_to({D}) below current D={self.D}")
        if D == self.D:
            return self
        new = {}
        for f, t in self.items():
            out = jnp.zeros((t.shape[0],) + (D,) * 4, t.dtype)
            new[f] = out.at[:, : t.shape[1], : t.shape[2], : t.shape[3], : t.shape[4]].set(t)
        cell = UnitCell(new["A"], new["B"], new["C"], rotated=self.rotated)
        return cell.add_noise(noise_fraction, key=key) if noise_fraction else cell

    def add_noise(self, fraction: float, key=None) -> "UnitCell":
        """Gaussian noise scaled by `fraction`·‖T‖ per tensor
        (reference: definition.py:166)."""
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        keys = jax.random.split(key, 3)
        new = {}
        for (f, t), k in zip(self.items(), keys):
            kr, ki = jax.random.split(k)
            noise = jax.random.normal(kr, t.shape)
            if jnp.issubdtype(t.dtype, jnp.complexfloating):
                noise = noise + 1j * jax.random.normal(ki, t.shape)
            noise = noise.astype(t.dtype)
            new[f] = t + noise * (fraction * jnp.linalg.norm(t) / jnp.linalg.norm(noise))
        return UnitCell(new["A"], new["B"], new["C"], rotated=self.rotated)

    def normalize(self) -> "UnitCell":
        return UnitCell(
            *(t / jnp.linalg.norm(t) for _, t in self.items()), rotated=self.rotated
        )

    def astype(self, dtype) -> "UnitCell":
        return UnitCell(*(t.astype(dtype) for _, t in self.items()), rotated=self.rotated)

    # -- persistence (reference: definition.py:119-144, plain pickle of numpy) --
    def save(self, path: str) -> str:
        from ..utils.jaxtools import to_numpy

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        data = {f: to_numpy(t) for f, t in self.items()}
        data["rotated"] = self.rotated
        with open(path, "wb") as fh:
            pickle.dump(data, fh)
        return path

    @staticmethod
    def load(path: str) -> "UnitCell":
        with open(path, "rb") as fh:
            data = pickle.load(fh)
        return UnitCell(
            jnp.asarray(data["A"]), jnp.asarray(data["B"]), jnp.asarray(data["C"]),
            rotated=data.get("rotated", 0),
        )


def fused_tensor(t: jnp.ndarray) -> jnp.ndarray:
    """ket ⊗ bra with ket-bra leg pairs fused: [d, D,D,D,D] → [D²,D²,D²,D²].
    (reference: libs/ITE.py:811 `fuse_tensor`)"""
    d = t.shape[0]
    D = t.shape[1]
    tt = jnp.tensordot(t, jnp.conj(t), axes=([0], [0]))  # [D]*4 + [D*]*4
    tt = jnp.transpose(tt, (0, 4, 1, 5, 2, 6, 3, 7))
    return tt.reshape(D * D, D * D, D * D, D * D)


def fused_tensor_with_operator(t: jnp.ndarray, op) -> jnp.ndarray:
    """ket–op–bra sandwich with fused ket-bra pairs: the double-layer tensor
    of ⟨ψ| op |ψ⟩ at one site, [d, D,D,D,D] + op[d, d] → [D²,D²,D²,D²]
    (reference: measurements.py:419
    `_sandwich_fused_tensors_with_expectation_values`)."""
    D = t.shape[1]
    t_op = jnp.tensordot(jnp.asarray(op, t.dtype), t, axes=([1], [0]))  # [d, D*4]
    tt = jnp.tensordot(t_op, jnp.conj(t), axes=([0], [0]))
    tt = jnp.transpose(tt, (0, 4, 1, 5, 2, 6, 3, 7))
    return tt.reshape(D * D, D * D, D * D, D * D)
