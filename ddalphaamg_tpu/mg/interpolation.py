"""Aggregation-based interpolation (prolongation), generic over levels.

The interpolation P is built from N test vectors, block-orthonormalized per
(aggregate x chirality) so that gamma5-compatibility holds: each coarse site
carries 2N degrees of freedom ordered (chirality, k).  Reference:
interpolation_PRECISION_define (src/setup_generic.c:191-275),
gram_schmidt_on_aggregates_PRECISION (src/linalg_generic.c:400-455),
restrict/interpolate (src/interpolation_generic.c:93-207).

Chirality of a field with per-site dof d:
  * fine spinors [.., 4, 3]: chirality = spin // 2 (gamma5 = diag(-,-,+,+)),
    i.e. the first/last 6 of the 12 site dof;
  * coarse fields [.., 2N]: first/last N dof.
Both are the "first half / second half of the site dof" rule, so one generic
implementation covers every level: fields enter in "chiral view"
[T,Z,Y,X, 2, dpc] (dpc = dof per chirality).

TPU realization: P is dense P[Tc,Zc,Yc,Xc, 2, N, m], m = agg_volume * dpc;
orthonormalization is one batched QR; restrict/interpolate are batched
[m, N] matmuls over all (coarse site, chirality) pairs -- MXU work, no index
tables (contrast the reference's aggregate site loops).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx


class Aggregation(NamedTuple):
    """Geometry of one coarsening step.

    fine_lattice: lattice of the level being coarsened
    coarsening:   aggregate extents per dimension
    num_vectors:  N test vectors (coarse dof = 2N)
    fine_dpc:     fine-level dof per chirality (6 on the fine grid, N_prev on
                  coarse levels)
    """

    fine_lattice: tuple
    coarsening: tuple
    num_vectors: int
    fine_dpc: int = 6

    @property
    def coarse_lattice(self):
        return tuple(self.fine_lattice[mu] // self.coarsening[mu] for mu in range(4))

    @property
    def agg_volume(self):
        return int(np.prod(self.coarsening))

    @property
    def m(self):
        """Rows per (aggregate, chirality) block."""
        return self.agg_volume * self.fine_dpc


def chiral_view(v: jnp.ndarray) -> jnp.ndarray:
    """[T,Z,Y,X, *dof] -> [T,Z,Y,X, 2, dpc]."""
    lat = v.shape[:4]
    return v.reshape(*lat, 2, -1)


def from_chiral_view(x: jnp.ndarray, dof_shape) -> jnp.ndarray:
    lat = x.shape[:4]
    return x.reshape(*lat, *dof_shape)


def to_aggregates(agg: Aggregation, v: jnp.ndarray) -> jnp.ndarray:
    """Field [T,Z,Y,X, *dof] -> [Tc,Zc,Yc,Xc, 2, m]."""
    ct, cz, cy, cx = agg.coarse_lattice
    at, az, ay, ax = agg.coarsening
    x = chiral_view(v).reshape(ct, at, cz, az, cy, ay, cx, ax, 2, agg.fine_dpc)
    # -> [Tc,Zc,Yc,Xc, chir, at,az,ay,ax, dpc]
    x = x.transpose(0, 2, 4, 6, 8, 1, 3, 5, 7, 9)
    return x.reshape(ct, cz, cy, cx, 2, agg.m)


def to_aggregates_batch(agg: Aggregation, vs: jnp.ndarray) -> jnp.ndarray:
    """[B, T,Z,Y,X, *dof] -> [Tc,Zc,Yc,Xc, 2, m, B] in ONE transpose.

    The per-field form (cplx.stack of B to_aggregates results) makes XLA
    materialize each element as a [1, field] temporary whose unit axis
    lands minormost and tile-pads to 128 lanes -- 3 MB -> 384 MB per
    temp at 16^4, the r4/r5 resetup-OOM class.  A whole-batch reshape +
    transpose has no unit axes anywhere."""
    ct, cz, cy, cx = agg.coarse_lattice
    at, az, ay, ax = agg.coarsening
    B = vs.shape[0]
    x = vs.reshape(B, ct, at, cz, az, cy, ay, cx, ax, 2, agg.fine_dpc)
    # -> [Tc,Zc,Yc,Xc, chir, at,az,ay,ax, dpc, B]
    x = x.transpose(1, 3, 5, 7, 9, 2, 4, 6, 8, 10, 0)
    return x.reshape(ct, cz, cy, cx, 2, agg.m, B)


def from_aggregates_batch(agg: Aggregation, x: jnp.ndarray,
                          dof_shape) -> jnp.ndarray:
    """[B, Tc,Zc,Yc,Xc, 2, m] -> [B, T,Z,Y,X, *dof] (batched inverse of
    to_aggregates; same no-stack rationale as to_aggregates_batch)."""
    ct, cz, cy, cx = agg.coarse_lattice
    at, az, ay, ax = agg.coarsening
    B = x.shape[0]
    x = x.reshape(B, ct, cz, cy, cx, 2, at, az, ay, ax, agg.fine_dpc)
    x = x.transpose(0, 1, 6, 2, 7, 3, 8, 4, 9, 5, 10)
    return x.reshape(B, ct * at, cz * az, cy * ay, cx * ax, *dof_shape)


def from_aggregates(agg: Aggregation, x: jnp.ndarray, dof_shape) -> jnp.ndarray:
    """Inverse of to_aggregates."""
    ct, cz, cy, cx = agg.coarse_lattice
    at, az, ay, ax = agg.coarsening
    x = x.reshape(ct, cz, cy, cx, 2, at, az, ay, ax, agg.fine_dpc)
    x = x.transpose(0, 5, 1, 6, 2, 7, 3, 8, 4, 9)
    v = x.reshape(ct * at, cz * az, cy * ay, cx * ax, 2 * agg.fine_dpc)
    return from_chiral_view(v.reshape(*v.shape[:4], 2, agg.fine_dpc), dof_shape)


def build_interpolation(agg: Aggregation, test_vectors: jnp.ndarray) -> jnp.ndarray:
    """Block-orthonormalize test vectors per (aggregate, chirality).

    test_vectors: [N, T,Z,Y,X, *dof]
    returns P: [Tc,Zc,Yc,Xc, 2, N, m] with orthonormal ROWS per (site, chir).

    Layout note: the rows-last form keeps m (= agg_volume * dpc, 96-class)
    as the minor axis.  The columns-last form [.., m, N] puts N in the
    lane dimension and XLA:TPU pads it to 128 -- at 32^4 with N=8 the
    stored P ballooned 16x to ~12 GB of HBM (measured; the root cause of
    the 32^4 ladder step's OOMs)."""
    cols = to_aggregates_batch(agg, test_vectors)  # [.., 2, m, N]
    q = cplx.block_qr(cols)              # [.., 2, m, N], orthonormal cols
    return cplx.moveaxis(q, -1, -2)      # -> [.., 2, N, m]


def restrict(agg: Aggregation, P: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """v_c = P^H v:  [T,Z,Y,X, *dof] -> [Tc,Zc,Yc,Xc, 2N]."""
    x = to_aggregates(agg, v)
    out = cplx.einsum("...ckm,...cm->...ck", cplx.conj(P), x)
    return out.reshape(*agg.coarse_lattice, 2 * agg.num_vectors)


def interpolate(agg: Aggregation, P: jnp.ndarray, v_c: jnp.ndarray, dof_shape) -> jnp.ndarray:
    """v = P v_c:  [Tc,Zc,Yc,Xc, 2N] -> fine field with dof_shape."""
    vc = v_c.reshape(*agg.coarse_lattice, 2, agg.num_vectors)
    x = cplx.einsum("...ckm,...ck->...cm", P, vc)
    return from_aggregates(agg, x, dof_shape)


def assemble_basis(agg: Aggregation, P: jnp.ndarray, dof_shape) -> jnp.ndarray:
    """All 2N globally-assembled coarse basis vectors as fine fields:
    B[c*N+k] = P e_{c,k} on every aggregate simultaneously.
    Shape: [2N, T,Z,Y,X, *dof].  Input to the Galerkin triple product.

    Built as ONE broadcast-multiply + batched layout transform: the
    former per-column cplx.stack materialized 2N [1, fine-field]
    temporaries whose unit axes tile-pad 128x on TPU (384 MB each at
    16^4 -- the r5 piece-wise Galerkin OOM).  For LARGE lattices prefer
    looping basis_column directly (galerkin_piece's static_cols form)
    so no [2N, fine-field] buffer exists at all."""
    N = agg.num_vectors
    # P [Tc,Zc,Yc,Xc, c, N, m] -> [c, N, Tc,Zc,Yc,Xc, m]
    pm = cplx.moveaxis(cplx.moveaxis(P, 4, 0), 5, 1)
    # chirality embedding: bagg[c, k, site, chir, m] = P[site, c, k, m]
    # * delta(c, chir) -- an exact 0/1 broadcast multiply, no einsum
    rdtype = pm.re.dtype if cplx.is_split(pm) else jnp.float32
    eye = jnp.eye(2, dtype=rdtype).reshape(2, 1, 1, 1, 1, 1, 2, 1)
    bagg = pm[:, :, :, :, :, :, None, :] * eye
    bagg = bagg.reshape(2 * N, *agg.coarse_lattice, 2, agg.m)
    return from_aggregates_batch(agg, bagg, dof_shape)


def basis_column(agg: Aggregation, P, dof_shape, q: int):
    """ONE globally-assembled coarse basis vector B[q] = P e_{c,k}
    (q = c*N + k) as a fine field.  q must be STATIC: a traced q makes the
    column extraction a dynamic gather over P's minor axes, for which XLA
    relayouts P into lane-padded copies (measured 2 x 3 GB, 8x padding, at
    32^4); static slicing is a free view."""
    N = agg.num_vectors
    c, k = divmod(int(q), N)
    col_p = P[..., c, k, :]
    z = cplx.zeros_like(col_p) if cplx.is_split(col_p) else jnp.zeros_like(col_p)
    col = cplx.stack([col_p if c == 0 else z, col_p if c == 1 else z],
                     axis=-2)
    return from_aggregates(agg, col, dof_shape)
