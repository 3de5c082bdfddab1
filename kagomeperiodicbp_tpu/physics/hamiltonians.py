"""2-local Hamiltonian terms in [i_ket, i_bra, j_ket, j_bra] layout.

(reference: /root/reference/src/physics/hamiltonians.py:30-85)
"""
from __future__ import annotations

import numpy as np

from . import pauli


def zero() -> np.ndarray:
    return np.zeros((2, 2, 2, 2), dtype=np.complex128)


def heisenberg_afm() -> np.ndarray:
    """AFM Heisenberg: h = S·S = ¼ Σ σᵢ⊗σᵢ (reference: hamiltonians.py:53)."""
    h = sum(pauli.two_site(pauli.SPIN[k], pauli.SPIN[k]) for k in "xyz")
    return np.asarray(h)


heisenberg_afm.reference = -0.40454  # published VU D=2 energy/site (hamiltonians.py:61)


def heisenberg_fm() -> np.ndarray:
    return -heisenberg_afm()


def heisenberg_afm_with_field(b: float = 0.0, direction: str = "z") -> np.ndarray:
    """AFM + uniform field −B·Σ Sᶻ distributed over edges: each site appears
    in 4 edges of the Kagome lattice, so the per-edge field weight is B/4
    (reference: hamiltonians.py:37-50)."""
    h = heisenberg_afm()
    s = pauli.SPIN[direction]
    h = h - (b / 4.0) * (pauli.two_site(s, pauli.id2) + pauli.two_site(pauli.id2, s))
    return h


def ising_with_transverse_field(b: float = 0.0) -> np.ndarray:
    """H = −ΣZZ − B·ΣX (per-edge X weight 1/4; reference: hamiltonians.py:71)."""
    h = -pauli.two_site(pauli.z, pauli.z)
    h = h - (b / 4.0) * (pauli.two_site(pauli.x, pauli.id2) + pauli.two_site(pauli.id2, pauli.x))
    return h


BY_NAME = {
    "AFM": heisenberg_afm,
    "FM": heisenberg_fm,
    "AFM-T": heisenberg_afm_with_field,
    "Ising-AFM": ising_with_transverse_field,
}
