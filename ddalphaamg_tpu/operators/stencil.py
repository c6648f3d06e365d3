"""Stencil adapters: a uniform operator interface for the SAP smoother and
the multigrid cycles across all levels.

A "stencil" exposes (all whole-lattice, mask-based; no per-block storage):
    full_op(v)        -- the full operator D v
    block_op(v)       -- D restricted to intra-Schwarz-block couplings
    self_op(v)        -- per-site self-coupling (clover / A)
    self_inv(v, mask) -- per-site inverse of the self-coupling on masked sites
    hop_intra(v)      -- intra-block hopping only
    even, odd         -- site-parity masks shaped to broadcast over the field

Stencils are registered JAX dataclass pytrees (geometry is static metadata),
so jitted functions over them retrace only on shape changes -- rebuilding the
coarse operator during the bootstrap setup reuses compiled code.

The fine level keeps the specialized half-spinor Wilson kernels (the flop
hot path); coarse levels use dense d x d block stencils (MXU batched).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..geometry import Geometry
from .coarse import CoarseOperator, coarse_apply, coarse_hop, intra_block_masks
from .oddeven import parity_masks
from .wilson import WilsonOperator, clover_apply, dslash_hopping


def _link_intra_mask(geom: Geometry) -> np.ndarray:
    """[4,T,Z,Y,X,1,1]: 0 where U_mu(x) crosses a Schwarz block boundary."""
    masks = []
    for mu in range(4):
        coord = np.arange(geom.lattice[mu])
        keep = (coord % geom.block[mu]) != (geom.block[mu] - 1)
        shape = [1, 1, 1, 1]
        shape[mu] = geom.lattice[mu]
        masks.append(np.broadcast_to(keep.reshape(shape), geom.lattice).astype(np.float64))
    return np.stack(masks)[..., None, None]


@partial(jax.tree_util.register_dataclass,
         data_fields=["links", "clover", "links_intra", "clover_inv", "even", "odd"],
         meta_fields=["geom"])
@dataclasses.dataclass(frozen=True)
class WilsonStencil:
    """Fine-grid Wilson-clover stencil (half-spinor kernels)."""

    links: object
    clover: object
    links_intra: object
    clover_inv: object
    even: jnp.ndarray
    odd: jnp.ndarray
    geom: Geometry

    @classmethod
    def build(cls, op: WilsonOperator, geom: Geometry, dtype=None) -> "WilsonStencil":
        if dtype is not None:
            op = op.astype(dtype)
        rdtype = (op.links.re.dtype if cplx.is_split(op.links)
                  else op.links.real.dtype)
        links_intra = op.links * jnp.asarray(_link_intra_mask(geom), dtype=rdtype)
        even, odd = parity_masks(geom.lattice, dtype=rdtype)
        return cls(links=op.links, clover=op.clover, links_intra=links_intra,
                   clover_inv=cplx.inv(op.clover), even=even, odd=odd, geom=geom)

    @property
    def dtype(self):
        return self.links.dtype

    @property
    def field_shape(self):
        return (*self.geom.lattice, 4, 3)

    def full_op(self, v):
        return clover_apply(self.clover, v) + dslash_hopping(self.links, v)

    def block_op(self, v):
        return clover_apply(self.clover, v) + dslash_hopping(self.links_intra, v)

    def self_op(self, v):
        return clover_apply(self.clover, v)

    def self_inv(self, v, mask):
        lat = v.shape[:4]
        ph = (mask * v).reshape(*lat, 2, 6)
        out = cplx.einsum("...cij,...cj->...ci", self.clover_inv, ph)
        return out.reshape(*lat, 4, 3)

    def hop_intra(self, v):
        return dslash_hopping(self.links_intra, v)


@partial(jax.tree_util.register_dataclass,
         data_fields=["A", "Df", "Db", "Df_intra", "Db_intra", "A_inv", "even", "odd"],
         meta_fields=["geom"])
@dataclasses.dataclass(frozen=True)
class CoarseStencil:
    """Coarse-grid dense block stencil."""

    A: object
    Df: object
    Db: object
    Df_intra: object
    Db_intra: object
    A_inv: object
    even: jnp.ndarray
    odd: jnp.ndarray
    geom: Geometry

    @classmethod
    def build(cls, cop: CoarseOperator, geom: Geometry, dtype=None) -> "CoarseStencil":
        if dtype is not None:
            cop = cop.astype(dtype)
        rdtype = cop.A.re.dtype if cplx.is_split(cop.A) else cop.A.real.dtype
        fwd, bwd = intra_block_masks(geom.lattice, geom.block)
        even, odd = parity_masks(geom.lattice, dtype=rdtype)
        return cls(A=cop.A, Df=cop.Df, Db=cop.Db,
                   Df_intra=cop.Df * jnp.asarray(fwd, dtype=rdtype),
                   Db_intra=cop.Db * jnp.asarray(bwd, dtype=rdtype),
                   A_inv=cplx.inv(cop.A),
                   even=even[..., 0, :], odd=odd[..., 0, :], geom=geom)

    @property
    def dtype(self):
        return self.A.dtype

    @property
    def cop(self):
        return CoarseOperator(self.A, self.Df, self.Db)

    @property
    def field_shape(self):
        return (*self.geom.lattice, self.A.shape[-1])

    def full_op(self, v):
        return coarse_apply(self.cop, v)

    def block_op(self, v):
        out = cplx.einsum("...ij,...j->...i", self.A, v)
        return out + coarse_hop(self.Df_intra, self.Db_intra, v)

    def self_op(self, v):
        return cplx.einsum("...ij,...j->...i", self.A, v)

    def self_inv(self, v, mask):
        return cplx.einsum("...ij,...j->...i", self.A_inv, mask * v)

    def hop_intra(self, v):
        return coarse_hop(self.Df_intra, self.Db_intra, v)
