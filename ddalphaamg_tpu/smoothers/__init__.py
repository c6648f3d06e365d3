import jax.numpy as jnp

from .sap import SchwarzPreconditioner as _SAP
from ..operators.stencil import WilsonStencil, CoarseStencil
from ..geometry import Geometry
from ..operators.wilson import WilsonOperator


def SchwarzPreconditioner(op, geom: Geometry = None, block_iter: int = 4,
                          cycles: int = 1, odd_even: bool = True,
                          dtype=jnp.complex64, scheme: str = "red_black"):
    """Build a SAP preconditioner.  Accepts either a stencil (any level) or a
    fine-grid WilsonOperator + Geometry (convenience)."""
    if isinstance(op, WilsonOperator):
        op = WilsonStencil.build(op, geom, dtype=dtype)
    return _SAP(op, block_iter=block_iter, cycles=cycles, odd_even=odd_even,
                scheme=scheme)


__all__ = ["SchwarzPreconditioner", "WilsonStencil", "CoarseStencil"]
