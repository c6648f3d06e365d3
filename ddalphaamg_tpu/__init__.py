"""ddalphaamg_tpu: TPU-native adaptive aggregation multigrid (DD-alphaAMG)
solver for the Wilson-clover Dirac equation, built from scratch on
JAX/XLA/Pallas.

Capabilities mirror the reference DDalphaAMG library (Wilson-clover operator,
Schwarz-alternating-procedure smoothing, adaptive aggregation multigrid with
K-cycles, odd-even preconditioning, mixed-precision FGMRES) redesigned for
TPU: dense [T,Z,Y,X,...] arrays, roll-based stencils, batched block solves,
sharding over a 4D device mesh.
"""

import os

import jax

# Double precision is part of the solver contract (outer residuals to 1e-10,
# matching the reference's double outer / float inner split).  Opt out with
# DDAAMG_NO_X64=1 before importing.
if not os.environ.get("DDAAMG_NO_X64"):
    jax.config.update("jax_enable_x64", True)

from . import gamma, geometry, io, gauge  # noqa: E402
from .operators import WilsonOperator, d_plus_clover, gamma5  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "gamma",
    "geometry",
    "io",
    "gauge",
    "WilsonOperator",
    "d_plus_clover",
    "gamma5",
]
