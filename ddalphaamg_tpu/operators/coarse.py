"""Coarse-grid operator: a 4D nearest-neighbor stencil of dense d x d blocks
(d = 2 * num_test_vectors).

Reference: src/coarse_operator_generic.c (apply_coarse_operator_PRECISION,
:383-415) and src/coarse_oddeven_generic.c.  The reference packs the
self-coupling as two Hermitian triangles + one full block and derives the
backward neighbor coupling as -gamma5c B^dagger gamma5c on the fly; here both
directions are stored dense -- each application is then 9 batched (d x d)
matvecs over all coarse sites, which is exactly what the MXU wants, at the
cost of ~2x the reference's stencil memory (cheap in HBM).

Coarse gamma5 is diag(+1_N, -1_N) ... our dof ordering is (chirality, k)
with chirality 0 = fine spins {0,1} (where fine gamma5 = -1), so
gamma5_c = diag(-1_N, +1_N), consistent with the fine convention.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import cplx


class CoarseOperator(NamedTuple):
    """A: [*lat, d, d] self-coupling; Df/Db: [4, *lat, d, d] neighbor
    couplings to phi(x+mu) / phi(x-mu) (hopping signs folded in)."""

    A: object
    Df: object
    Db: object

    @property
    def lattice(self):
        return self.A.shape[:4]

    @property
    def dof(self):
        return self.A.shape[-1]

    def astype(self, dtype):
        if cplx.is_split(self.A):
            rdtype = np.zeros((), np.dtype(dtype)).real.dtype
            return CoarseOperator(self.A.astype_real(rdtype),
                                  self.Df.astype_real(rdtype),
                                  self.Db.astype_real(rdtype))
        return CoarseOperator(self.A.astype(dtype), self.Df.astype(dtype),
                              self.Db.astype(dtype))


def coarse_apply(cop: CoarseOperator, phi):
    """eta(x) = A(x) phi(x) + sum_mu [Df_mu(x) phi(x+mu) + Db_mu(x) phi(x-mu)]."""
    out = cplx.einsum("...ij,...j->...i", cop.A, phi)
    for mu in range(4):
        out = out + cplx.einsum("...ij,...j->...i", cop.Df[mu], cplx.roll(phi, -1, mu))
        out = out + cplx.einsum("...ij,...j->...i", cop.Db[mu], cplx.roll(phi, 1, mu))
    return out


def coarse_hop(Df, Db, phi):
    """Hopping-only part (for masked/intra-block applications)."""
    out = None
    for mu in range(4):
        t = cplx.einsum("...ij,...j->...i", Df[mu], cplx.roll(phi, -1, mu))
        t = t + cplx.einsum("...ij,...j->...i", Db[mu], cplx.roll(phi, 1, mu))
        out = t if out is None else out + t
    return out


def coarse_gamma5(phi):
    """gamma5_c phi = diag(-1_N, +1_N) phi (dof ordered (chirality, k))."""
    n = phi.shape[-1] // 2
    return cplx.concatenate([-phi[..., :n], phi[..., n:]], axis=-1)


def intra_block_masks(lattice, block) -> tuple[np.ndarray, np.ndarray]:
    """(fwd, bwd) masks [4, T,Z,Y,X, 1, 1]: fwd=0 where x is on the block's
    upper mu face (the x -> x+mu coupling crosses), bwd=0 on the lower face."""
    fwd, bwd = [], []
    for mu in range(4):
        coord = np.arange(lattice[mu])
        shape = [1, 1, 1, 1]
        shape[mu] = lattice[mu]
        up = ((coord % block[mu]) != (block[mu] - 1)).reshape(shape)
        lo = ((coord % block[mu]) != 0).reshape(shape)
        fwd.append(np.broadcast_to(up, lattice).astype(np.float64))
        bwd.append(np.broadcast_to(lo, lattice).astype(np.float64))
    return (np.stack(fwd)[..., None, None], np.stack(bwd)[..., None, None])
