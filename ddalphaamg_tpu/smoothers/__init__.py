import jax
import jax.numpy as jnp

from .sap import SchwarzPreconditioner as _SAP
from ..operators.stencil import WilsonStencil, WilsonStencilSoA, CoarseStencil
from ..geometry import Geometry
from ..operators.wilson import WilsonOperator
from .. import cplx


class _BoundarySAP:
    """Standalone SAP preconditioner with layout/representation conversion
    at the boundary (the Multigrid.__call__ trans analog) -- used when the
    smoother is the whole preconditioner (reference method 1-3 with one
    level, src/preconditioner.c:25-69)."""

    def __init__(self, inner: _SAP, stencil):
        self._inner = inner
        self._s = stencil

    def __call__(self, eta, cycles=None):
        split_in = cplx.is_split(eta)
        if not split_in:
            eta = cplx.as_carray(eta)
        out = self._s.to_logical(self._inner(self._s.from_logical(eta),
                                             cycles=cycles))
        if not split_in and cplx.is_split(out):
            out = jax.lax.complex(out.re, out.im)
        return out


def SchwarzPreconditioner(op, geom: Geometry = None, block_iter: int = 4,
                          cycles: int = 1, odd_even: bool = True,
                          dtype=jnp.complex64, scheme: str = "red_black",
                          use_soa: bool = None):
    """Build a SAP preconditioner.  Accepts either a stencil (any level) or a
    fine-grid WilsonOperator + Geometry (convenience).  With use_soa (the
    default on TPU) the smoother runs in the SoA fast-path layout and
    converts at its boundary."""
    if isinstance(op, WilsonOperator):
        if use_soa is None:
            use_soa = jax.default_backend() == "tpu"
        if use_soa:
            st = WilsonStencilSoA.build(op, geom, dtype=dtype)
            inner = _SAP(st, block_iter=block_iter, cycles=cycles,
                         odd_even=odd_even, scheme=scheme)
            return _BoundarySAP(inner, st)
        op = WilsonStencil.build(op, geom, dtype=dtype)
    return _SAP(op, block_iter=block_iter, cycles=cycles, odd_even=odd_even,
                scheme=scheme)


__all__ = ["SchwarzPreconditioner", "WilsonStencil", "CoarseStencil"]
