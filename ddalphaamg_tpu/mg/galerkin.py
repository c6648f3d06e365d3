"""Galerkin coarse-grid operator:  D_c = P^H D P.

Reference: coarse_operator_PRECISION_setup + set_coarse_self/neighbor_coupling
(src/coarse_operator_generic.c:53-205), which accumulates aggregate-local
spin-split applications.  TPU redesign: split the level operator by aggregate
locality,

    D = D_intra + sum_mu (D_cross_fwd,mu + D_cross_bwd,mu),

apply each piece to all 2N globally-assembled basis vectors at once (batched
whole-lattice stencils via vmap), and restrict:

    A(x)        column j = P_x^H (D_intra      B_j)|_x      (self-coupling)
    Df_mu(x)    column j = P_x^H (D_cross_fwd  B_j)|_x      (x <- x+mu)
    Db_mu(x)    column j = P_x^H (D_cross_bwd  B_j)|_x      (x <- x-mu)

No leakage: B_j's columns live on single aggregates and each split piece
maps between fixed aggregate pairs, so the restriction isolates exactly one
coupling block.  Everything is batched matmuls -- no sparse assembly, no
index tables, setup cost ~ 2N x (2 full stencil applications).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..operators.coarse import CoarseOperator, coarse_hop
from ..operators.wilson import (
    WilsonOperator,
    clover_apply,
    dslash_bwd,
    dslash_fwd,
    dslash_hopping,
)
from .interpolation import Aggregation, assemble_basis, basis_column, restrict


def _agg_face_masks(lattice, coarsening):
    """(upper, lower) face masks [4, T,Z,Y,X, 1, 1] over aggregates."""
    up, lo = [], []
    for mu in range(4):
        coord = np.arange(lattice[mu])
        shape = [1, 1, 1, 1]
        shape[mu] = lattice[mu]
        u = ((coord % coarsening[mu]) == (coarsening[mu] - 1)).reshape(shape)
        l = ((coord % coarsening[mu]) == 0).reshape(shape)
        up.append(np.broadcast_to(u, lattice).astype(np.float64))
        lo.append(np.broadcast_to(l, lattice).astype(np.float64))
    return np.stack(up)[..., None, None], np.stack(lo)[..., None, None]


def _map(f, xs):
    """Sequential map over the leading (basis) axis.

    vmap here multiplies every whole-lattice intermediate by 2N: at 16^4
    with N=12 the Galerkin build peaked at 13 GiB of XLA temps (measured via
    memory_analysis) -- more than a v5e's HBM.  The basis applications are
    full-lattice stencil sweeps with plenty of inner parallelism, so
    sequential lax.map costs nothing and caps the peak at ~one field."""
    return jax.lax.map(f, xs)


def _stack_columns(agg: Aggregation, P: jnp.ndarray, fields: jnp.ndarray) -> jnp.ndarray:
    """Restrict a batch of 2N fields -> [Tc,Zc,Yc,Xc, 2N(row), 2N(col)]."""
    cols = _map(lambda f: restrict(agg, P, f), fields)  # [2N, Tc.., 2N]
    return cplx.moveaxis(cols, 0, -1)


def build_coarse_operator(op, agg: Aggregation, P: jnp.ndarray) -> CoarseOperator:
    """Build D_c = P^H D P for a fine WilsonOperator or a CoarseOperator."""
    if isinstance(op, WilsonOperator):
        return _from_wilson(op, agg, P)
    if isinstance(op, CoarseOperator):
        return _from_coarse(op, agg, P)
    raise TypeError(type(op))


def _make_columns(agg: Aggregation, P, dof_shape, static_cols: bool):
    """columns(apply_fn) -> [Tc.., 2N(row), 2N(col)] coupling block.

    static_cols=True: assemble + apply + restrict per STATICALLY-unrolled
    basis column -- one live fine field per step, static P slices (the
    large-lattice form: the stacked-B buffer is 3 GB after XLA's 4x lane
    padding at 32^4, and a traced column index relayout-copies P at 8x
    padding).  static_cols=False: lax.map over the materialized basis --
    a small trace (the 16^4 fused one-program resetup would otherwise
    inline 9 pieces x 2N bodies)."""
    if static_cols:
        def columns(apply_fn):
            return cplx.stack(
                [restrict(agg, P, apply_fn(basis_column(agg, P, dof_shape, q)))
                 for q in range(2 * agg.num_vectors)], axis=-1)
    else:
        B = assemble_basis(agg, P, dof_shape)

        def columns(apply_fn):
            return cplx.moveaxis(
                _map(lambda b: restrict(agg, P, apply_fn(b)), B), 0, -1)
    return columns


def galerkin_piece(op, agg: Aggregation, P, kind: str, mu: int = 0,
                   static_cols: bool = False):
    """ONE coupling block of D_c: kind "A" (self), "Df"/"Db" (directional).

    The chunkable unit for large lattices: the whole-operator build as a
    single program holds all nine pieces' intermediates at once (measured
    66 GB of HBM demand at 32^4); per-piece programs peak at ~the basis
    plus one fine field."""
    if isinstance(op, WilsonOperator):
        dof_shape = (4, 3)
        split = cplx.is_split(op.links)
        rdtype = op.links.re.dtype if split else op.links.real.dtype
        up_np, _ = _agg_face_masks(agg.fine_lattice, agg.coarsening)
        columns = _make_columns(agg, P, dof_shape, static_cols)

        if static_cols and split:
            # large-lattice path: the LOGICAL link layout's [..., 3, 3]
            # minor dims tile-pad ~57x on TPU (one sliced link copy = 2 GB
            # at 32^4); run the piece applies in the dof-major SoA layout
            from ..operators import fast
            lattice = agg.fine_lattice
            roll = fast.make_rollers(lattice, rdtype)

            def wrap(fn):
                return lambda b: fast.spinor_from_soa(
                    fn(fast.spinor_to_soa(b)), lattice)

            if kind == "A_self":
                clov_soa = fast.clover_to_soa(op.clover)
                return columns(wrap(
                    lambda b: fast.clover_apply_soa(clov_soa, b)))
            face = kind in ("Df", "Db")
            msel = up_np if face else (1.0 - up_np)
            mask = fast.lattice_mask_to_soa(
                np.ascontiguousarray(msel[mu, ..., 0, 0]), rdtype)
            lmu = fast.links_to_soa(op.links)[mu] * mask
            part = ("f",) if kind in ("A_fwd", "Df") else ("b",)
            lst = [lmu] * 4   # python list: only links[mu] is read, no copy
            return columns(wrap(
                lambda b: fast.dslash_hopping_soa(lst, b, roll,
                                                  dirs=(mu,), parts=part)))

        up = jnp.asarray(up_np, dtype=rdtype)
        if kind == "A":
            links_intra = op.links * (1.0 - up)
            return columns(lambda b: clover_apply(op.clover, b)
                           + dslash_hopping(links_intra, b))
        if kind == "A_self":
            return columns(lambda b: clover_apply(op.clover, b))
        if kind == "A_fwd":
            links_intra = op.links * (1.0 - up)
            return columns(lambda b: dslash_fwd(links_intra, b, dirs=(mu,)))
        if kind == "A_bwd":
            links_intra = op.links * (1.0 - up)
            return columns(lambda b: dslash_bwd(links_intra, b, dirs=(mu,)))
        links_face = op.links * up
        if kind == "Df":
            return columns(lambda b: dslash_fwd(links_face, b, dirs=(mu,)))
        return columns(lambda b: dslash_bwd(links_face, b, dirs=(mu,)))

    cop = op
    dof_shape = (cop.dof,)
    rdtype = cop.A.re.dtype if cplx.is_split(cop.A) else cop.A.real.dtype
    up, lo = _agg_face_masks(agg.fine_lattice, agg.coarsening)
    up = jnp.asarray(up, dtype=rdtype)
    lo = jnp.asarray(lo, dtype=rdtype)

    columns = _make_columns(agg, P, dof_shape, static_cols)

    if kind == "A":
        Df_intra, Db_intra = cop.Df * (1.0 - up), cop.Db * (1.0 - lo)
        return columns(lambda b: cplx.einsum("...ij,...j->...i", cop.A, b)
                       + coarse_hop(Df_intra, Db_intra, b))
    # single-direction pieces mask only the selected direction: masking the
    # full [4, lat, d, d] array pads 8x per copy (2 GB at a 16^4 d=16 level)
    if kind == "A_self":
        return columns(lambda b: cplx.einsum("...ij,...j->...i", cop.A, b))
    if kind == "A_fwd":
        blk = cop.Df[mu] * (1.0 - up[mu])
        return columns(lambda b: cplx.einsum(
            "...ij,...j->...i", blk, cplx.roll(b, -1, mu)))
    if kind == "A_bwd":
        blk = cop.Db[mu] * (1.0 - lo[mu])
        return columns(lambda b: cplx.einsum(
            "...ij,...j->...i", blk, cplx.roll(b, 1, mu)))
    if kind == "Df":
        blk = cop.Df[mu] * up[mu]
        return columns(lambda b: cplx.einsum(
            "...ij,...j->...i", blk, cplx.roll(b, -1, mu)))
    blk = cop.Db[mu] * lo[mu]
    return columns(lambda b: cplx.einsum(
        "...ij,...j->...i", blk, cplx.roll(b, 1, mu)))


def _from_wilson(op: WilsonOperator, agg: Aggregation, P: jnp.ndarray) -> CoarseOperator:
    A = galerkin_piece(op, agg, P, "A")
    Df = [galerkin_piece(op, agg, P, "Df", mu) for mu in range(4)]
    Db = [galerkin_piece(op, agg, P, "Db", mu) for mu in range(4)]
    return CoarseOperator(A=A, Df=cplx.stack(Df), Db=cplx.stack(Db))


def _from_coarse(cop: CoarseOperator, agg: Aggregation, P: jnp.ndarray) -> CoarseOperator:
    A = galerkin_piece(cop, agg, P, "A")
    Df = [galerkin_piece(cop, agg, P, "Df", mu) for mu in range(4)]
    Db = [galerkin_piece(cop, agg, P, "Db", mu) for mu in range(4)]
    return CoarseOperator(A=A, Df=cplx.stack(Df), Db=cplx.stack(Db))
