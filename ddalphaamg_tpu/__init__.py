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

# Persistent XLA compilation cache: the solver stack compiles ~15 device
# programs (traced cycles, setup kernels, df outer loop); on a remote-compile
# TPU relay that is minutes of fixed cost per process.  Measured: 4^4 setup
# 198 s -> 63 s with a warm cache.  Opt out with DDAAMG_NO_COMPILE_CACHE=1.
if not os.environ.get("DDAAMG_NO_COMPILE_CACHE"):
    try:
        # TPU only: XLA:CPU persists machine-feature-specific AOT code that
        # can be loaded in a mismatched context (SIGILL risk); the win is on
        # the remote-compile TPU relay anyway.  Decide from the platform
        # *request* (env), not jax.default_backend(): backend init here would
        # connect to the TPU relay at import time, before a --platform cpu
        # override can take effect (and blocks every CLI if the relay is
        # unreachable).  An UNSET env means the default backend -- the TPU
        # relay on production machines -- so the cache stays ON (the driver
        # invokes bench.py with no JAX_PLATFORMS; cold setup compiles cost
        # minutes).  Callers that pin CPU after import (cli --platform cpu,
        # __graft_entry__ fallback) un-configure the cache themselves.
        _plat = (os.environ.get("JAX_PLATFORMS") or "").lower()
        if "cpu" not in _plat:
            _cache_dir = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                          or os.path.expanduser("~/.cache/ddalphaamg_tpu/xla"))
            os.makedirs(_cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

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
