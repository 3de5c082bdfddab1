"""kagomeperiodicbp_tpu — TPU-native BlockBP + imaginary-time evolution for
iPEPS ground states on the infinite Kagome lattice.

A from-scratch JAX/XLA re-design with the capabilities of
NGBigField/KagomePeriodicBP: 3-tensor unit cell, hexagonal Kagome block,
boundary-MPS Block Belief Propagation environments, and full-update ITE with
ALS bond truncation — all as statically-planned, jit-compiled programs.
"""

__version__ = "0.1.0"
