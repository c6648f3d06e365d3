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


class _LogicalLayout:
    """Layout hooks shared by stencils whose fields are [T,Z,Y,X, dof...].
    The SAP smoother goes through these instead of hard-coding axis order,
    so SoA stencils can override them (reference analog: the Schwarz layout
    translation trans_PRECISION, src/schwarz_generic.c:1807)."""

    def to_logical(self, v):
        return v

    def from_logical(self, v):
        return v

    def to_logical_batch(self, vs):
        """Batched to_logical over a leading stack axis, as ONE program.
        Per-vector to_logical + cplx.stack lowers to broadcast_in_dim
        temporaries with a length-1 minormost axis that XLA tile-pads to
        128 lanes (a measured 128x HBM expansion at 28 test vectors);
        batching the layout change keeps it a single transpose."""
        return jax.vmap(self.to_logical)(vs)

    def from_logical_batch(self, vs):
        return jax.vmap(self.from_logical)(vs)

    def lattice_mask(self, mask_np):
        """[T,Z,Y,X] numpy mask -> field-broadcastable jnp array."""
        rdtype = np.zeros((), np.dtype(self.dtype)).real.dtype
        extra = (1,) * (len(self.field_shape) - 4)
        return jnp.asarray(np.asarray(mask_np).reshape(mask_np.shape + extra),
                           dtype=rdtype)

    def dof_sum(self, a):
        """Sum |field|-like quantities over dof axes -> lattice-shaped."""
        return cplx.sum_dof(a, tuple(range(4, a.ndim)))

    def block_sum(self, a, geom: Geometry):
        gt, gz, gy, gx = geom.block_grid
        bt, bz, by, bx = geom.block
        if cplx.is_split(a):
            return cplx.CArray(self.block_sum(a.re, geom),
                               self.block_sum(a.im, geom))
        return a.reshape(gt, bt, gz, bz, gy, by, gx, bx).sum(axis=(1, 3, 5, 7))

    def block_expand(self, a, geom: Geometry):
        """Block-grid values -> field-broadcastable per-site values."""
        if cplx.is_split(a):
            return cplx.CArray(self.block_expand(a.re, geom),
                               self.block_expand(a.im, geom))
        for mu in range(4):
            a = jnp.repeat(a, geom.block[mu], axis=mu)
        return a.reshape(a.shape + (1,) * (len(self.field_shape) - 4))


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
class WilsonStencil(_LogicalLayout):
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
                   clover_inv=cplx.herm_inv(op.clover), even=even, odd=odd, geom=geom)

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
class CoarseStencil(_LogicalLayout):
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
                   # LU-factored inverse (jnp.linalg.inv = batched LU with
                   # partial pivoting; reference coarse self-coupling LU,
                   # src/coarse_oddeven_generic.c:24-75, pivots not at all)
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

    def hop(self, v):
        return coarse_hop(self.Df, self.Db, v)

    def block_op(self, v):
        out = cplx.einsum("...ij,...j->...i", self.A, v)
        return out + coarse_hop(self.Df_intra, self.Db_intra, v)

    def self_op(self, v):
        return cplx.einsum("...ij,...j->...i", self.A, v)

    def self_inv(self, v, mask):
        return cplx.einsum("...ij,...j->...i", self.A_inv, mask * v)

    def hop_intra(self, v):
        return coarse_hop(self.Df_intra, self.Db_intra, v)


@partial(jax.tree_util.register_dataclass,
         data_fields=["Pk", "Pk_inv", "fwd_m", "bwd_m", "even", "odd"],
         meta_fields=["geom", "layout", "use_pallas", "mesh"])
@dataclasses.dataclass(frozen=True)
class CoarseStencilSoA:
    """Coarse-grid block stencil in PACKED dof-major storage: the 9 stencil
    terms [A, Df_0..3, Db_0..3] live in one tiling-exact tensor
    (operators/pallas_coarse.py; "t": [9, T, d*d, Z*Y*X],
    "tz": [9, T, Z, d*d, Y*X]); fields stay [d, T, Z, M] with M = Y*X.

    TPU rationale (the reference's AoSoA coarse layout,
    src/vectorization_control.h:46 / sse_coarse_operator_generic.c:28-230):
    the coarse apply is HBM-bound on the 9 d x d block reads per site, and
    XLA:TPU tiles the two minor dims of every array to (8, 128) -- the old
    dof-major [d, d, T, Z, M] layout had minor dims (Z, M) = (8, 64)-class,
    so HALF of every HBM line was tiling padding.  Packing makes the minor
    dims (d*d, ZM)-class (tiling-exact), so the fused Pallas kernel streams
    the blocks at the HBM roofline (measured 8^4 d=32: 0.191 ms bf16
    vs 0.625 ms for the old layout).

    Block-restricted (Schwarz) operators multiply per-direction intra-block
    masks into the shifted FIELDS, never into the blocks, so ONE packed
    tensor serves full_op / block_op / hop / hop_intra / self_op -- half
    the stencil memory of storing masked block copies.
    """

    Pk: object              # packed 9-term blocks [A, Df0..3, Db0..3]
    Pk_inv: object          # packed 1-term A^-1
    fwd_m: jnp.ndarray      # [4,T,Z,M] intra-block masks (0 on upper faces)
    bwd_m: jnp.ndarray      # [4,T,Z,M] (0 on lower faces)
    even: jnp.ndarray       # [T,Z,M]
    odd: jnp.ndarray
    geom: Geometry
    # packed layout: "t" fuses Z*Y*X (fastest; single-device / replicated /
    # t-sharded), "tz" keeps Z a shardable axis (z-sharded meshes)
    layout: str = "t"
    use_pallas: bool = False
    # 4D device mesh: when set (parallel.shard_stencil), every op runs as a
    # shard_map over per-device sub-lattices with explicit face exchange
    # (parallel/shard_ops.py) instead of GSPMD-partitioned global rolls
    mesh: object = None

    @classmethod
    def build(cls, cop: CoarseOperator, geom: Geometry, dtype=None,
              layout: str = "t", use_pallas=None) -> "CoarseStencilSoA":
        from . import pallas_coarse as pc
        from .fast import lattice_mask_to_soa
        if dtype is not None:
            cop = cop.astype(dtype)
        split = cplx.is_split(cop.A)
        rdtype = cop.A.re.dtype if split else cop.A.real.dtype
        if use_pallas is None:
            import os
            use_pallas = split and (jax.default_backend() == "tpu"
                                    or bool(os.environ.get("DDAAMG_FORCE_PALLAS")))
        t, z, y, x = geom.lattice
        Bs = cplx.concatenate([cop.A[None], cop.Df, cop.Db], axis=0)
        Ainv = cplx.inv(cop.A)
        fwd, bwd = intra_block_masks(geom.lattice, geom.block)
        par = (np.indices(geom.lattice).sum(axis=0) % 2 == 0).astype(np.float64)
        return cls(
            Pk=pc.pack_blocks(Bs, layout),
            Pk_inv=pc.pack_blocks(Ainv[None], layout),
            fwd_m=jnp.asarray(fwd[..., 0, 0].reshape(4, t, z, y * x), rdtype),
            bwd_m=jnp.asarray(bwd[..., 0, 0].reshape(4, t, z, y * x), rdtype),
            even=lattice_mask_to_soa(par, rdtype),
            odd=lattice_mask_to_soa(1.0 - par, rdtype),
            geom=geom, layout=layout, use_pallas=bool(use_pallas))

    @classmethod
    def build_chunked(cls, cop: CoarseOperator, geom: Geometry, dtype=None,
                      layout: str = "t", use_pallas=None,
                      slab_sites: int = 2 ** 15) -> "CoarseStencilSoA":
        """Memory-lean build for LARGE coarse levels: pack_blocks'
        [9,T,Z,Y,X,d,d] transpose intermediate tile-pads 8x (4.5 GB at a
        16^4 d=16 level) inside the one-program build; here packing and
        the batched self-coupling inverse run per T-slab as separate
        jitted programs and concatenate along the packed T axis.  Output
        identical to build()."""
        from . import pallas_coarse as pc
        from .fast import lattice_mask_to_soa
        if dtype is not None:
            cop = cop.astype(dtype)
        split = cplx.is_split(cop.A)
        rdtype = cop.A.re.dtype if split else cop.A.real.dtype
        if use_pallas is None:
            import os
            use_pallas = split and (jax.default_backend() == "tpu"
                                    or bool(os.environ.get("DDAAMG_FORCE_PALLAS")))
        t, z, y, x = geom.lattice
        sites_per_t = z * y * x
        tc = max(1, min(t, slab_sites // max(sites_per_t, 1)))
        while t % tc:
            tc -= 1

        @partial(jax.jit, static_argnames=("lay",))
        def _slab(A, Df, Db, lay):
            Bs = cplx.concatenate([A[None], Df, Db], axis=0)
            return pc.pack_blocks(Bs, lay), pc.pack_blocks(cplx.inv(A)[None],
                                                           lay)

        pks, pkis = [], []
        for i in range(t // tc):
            s = slice(i * tc, (i + 1) * tc)
            pk, pki = _slab(cop.A[s], cop.Df[:, s], cop.Db[:, s], layout)
            pks.append(pk)
            pkis.append(pki)
        Pk = cplx.concatenate(pks, axis=1)
        Pk_inv = cplx.concatenate(pkis, axis=1)
        fwd, bwd = intra_block_masks(geom.lattice, geom.block)
        par = (np.indices(geom.lattice).sum(axis=0) % 2 == 0).astype(np.float64)
        return cls(
            Pk=Pk, Pk_inv=Pk_inv,
            fwd_m=jnp.asarray(fwd[..., 0, 0].reshape(4, t, z, y * x), rdtype),
            bwd_m=jnp.asarray(bwd[..., 0, 0].reshape(4, t, z, y * x), rdtype),
            even=lattice_mask_to_soa(par, rdtype),
            odd=lattice_mask_to_soa(1.0 - par, rdtype),
            geom=geom, layout=layout, use_pallas=bool(use_pallas))

    @property
    def dtype(self):
        return self.Pk.dtype

    @property
    def dof(self) -> int:
        n2 = self.Pk.shape[2 if self.layout == "t" else 3]
        return int(round(np.sqrt(n2)))

    @property
    def field_shape(self):
        t, z, y, x = self.geom.lattice
        return (self.dof, t, z, y * x)

    @property
    def cop(self) -> CoarseOperator:
        """Logical-layout view (Galerkin input for the next coarsening)."""
        from . import pallas_coarse as pc
        Bs = pc.unpack_blocks(self.Pk, self.geom.lattice, self.layout)
        return CoarseOperator(Bs[0], Bs[1:5], Bs[5:9])

    @property
    def A(self):
        """Self-coupling in the dof-major view [d, d, T, Z, M]
        (diagnostics/tests; not on the apply path)."""
        from . import pallas_coarse as pc
        t, z, y, x = self.geom.lattice
        a = pc.unpack_blocks(self.Pk[0:1], self.geom.lattice, self.layout)[0]
        perm = (4, 5, 0, 1, 2, 3)
        out = _transpose_any(a, perm)
        d = self.dof
        return out.reshape(d, d, t, z, y * x)

    def relayout(self, layout: str) -> "CoarseStencilSoA":
        """Repack the block storage into another packed layout (cheap
        transposes; used when attaching a z-sharding mesh)."""
        if layout == self.layout:
            return self
        from . import pallas_coarse as pc
        lat = self.geom.lattice
        return dataclasses.replace(
            self,
            Pk=pc.pack_blocks(pc.unpack_blocks(self.Pk, lat, self.layout),
                              layout),
            Pk_inv=pc.pack_blocks(
                pc.unpack_blocks(self.Pk_inv, lat, self.layout), layout),
            layout=layout)

    def compress(self, rdtype=jnp.bfloat16) -> "CoarseStencilSoA":
        """Store the stencil blocks (not the fields) in a narrower real dtype.

        TPU rationale: coarse-level applies are HBM-bound on the 9 d x d
        block reads per site (the fields are ~d x smaller); bf16 block
        storage halves that traffic.  The entire coarse hierarchy is inside
        the flexible outer solver's preconditioner, so the ~4e-3 relative
        block perturbation only has to leave the SAP/K-cycle/coarsest
        tolerances (1e-1 / 5e-2) intact.  The Pallas kernel (and the XLA
        fallback) widens blocks back to f32 at multiply time, keeping f32
        accumulation.
        """
        if not cplx.is_split(self.Pk):
            raise NotImplementedError("compress() requires the split"
                                      " representation (TPU path)")
        return dataclasses.replace(
            self,
            Pk=self.Pk.astype_real(rdtype),
            Pk_inv=self.Pk_inv.astype_real(rdtype))

    def _roll(self):
        return _cached_rollers(self.geom.lattice,
                               str(self.even.dtype))

    def _stack_shifts(self, v, masked: bool, include_self: bool):
        """The (self +) 8 neighbor fields stacked [k, d, T, Z, M]; `masked`
        multiplies the per-direction intra-block masks into the shifted
        fields (the Schwarz restriction -- block-crossing couplings read
        wrong wrapped data that the zero mask kills)."""
        roll = self._roll()
        vs = [v] if include_self else []
        for mu in range(4):
            w = roll(v, -1, mu)
            vs.append(self.fwd_m[mu] * w if masked else w)
        for mu in range(4):
            w = roll(v, 1, mu)
            vs.append(self.bwd_m[mu] * w if masked else w)
        return cplx.stack(vs, axis=0)

    def _apply(self, Pk, vs):
        from . import pallas_coarse as pc
        return pc.apply_packed(Pk, vs, self.geom.lattice, self.layout,
                               self.use_pallas,
                               interpret=_interp() if self.use_pallas else None)

    def hop(self, v):
        if self.mesh is not None:
            from ..parallel.shard_ops import coarse_sharded
            return coarse_sharded(self, v, "hop")
        return self._apply(self.Pk[1:], self._stack_shifts(v, False, False))

    def full_op(self, v):
        if self.mesh is not None:
            from ..parallel.shard_ops import coarse_sharded
            return coarse_sharded(self, v, "full")
        return self._apply(self.Pk, self._stack_shifts(v, False, True))

    def block_op(self, v):
        if self.mesh is not None:
            from ..parallel.shard_ops import coarse_sharded
            return coarse_sharded(self, v, "block")
        return self._apply(self.Pk, self._stack_shifts(v, True, True))

    def self_op(self, v):
        if self.mesh is not None:
            from ..parallel.shard_ops import coarse_sharded
            return coarse_sharded(self, v, "self")
        return self._apply(self.Pk[0:1], cplx.stack([v], axis=0))

    def self_inv(self, v, mask):
        if self.mesh is not None:
            from ..parallel.shard_ops import coarse_sharded
            return coarse_sharded(self, v, "self_inv", mask=mask)
        return self._apply(self.Pk_inv, cplx.stack([mask * v], axis=0))

    def hop_intra(self, v):
        if self.mesh is not None:
            from ..parallel.shard_ops import coarse_sharded
            return coarse_sharded(self, v, "hop_intra")
        return self._apply(self.Pk[1:], self._stack_shifts(v, True, False))

    # --- layout hooks ---

    def to_logical(self, v):
        t, z, y, x = self.geom.lattice
        d = v.shape[0]
        return _transpose_any(v.reshape(d, t, z, y, x), (1, 2, 3, 4, 0))

    def from_logical(self, v):
        t, z, y, x = self.geom.lattice
        return _transpose_any(v, (4, 0, 1, 2, 3)).reshape(-1, t, z, y * x)

    def to_logical_batch(self, vs):
        """[N, d, T, Z, Y*X] -> [N, T, Z, Y, X, d] as one transpose (no
        per-vector stack: that path tile-pads 128x, see _LogicalLayout)."""
        t, z, y, x = self.geom.lattice
        n, d = vs.shape[0], vs.shape[1]
        return _transpose_any(vs.reshape(n, d, t, z, y, x),
                              (0, 2, 3, 4, 5, 1))

    def from_logical_batch(self, vs):
        t, z, y, x = self.geom.lattice
        n = vs.shape[0]
        return _transpose_any(vs, (0, 5, 1, 2, 3, 4)).reshape(
            n, -1, t, z, y * x)

    def lattice_mask(self, mask_np):
        from .fast import lattice_mask_to_soa
        rdtype = np.zeros((), np.dtype(self.dtype)).real.dtype
        return lattice_mask_to_soa(np.asarray(mask_np), rdtype)

    def dof_sum(self, a):
        return cplx.sum_dof(a, (0,))

    def block_sum(self, a, geom: Geometry):
        gt, gz, gy, gx = geom.block_grid
        bt, bz, by, bx = geom.block
        if cplx.is_split(a):
            return cplx.CArray(self.block_sum(a.re, geom),
                               self.block_sum(a.im, geom))
        return a.reshape(gt, bt, gz, bz, gy, by, gx, bx).sum(axis=(1, 3, 5, 7))

    def block_expand(self, a, geom: Geometry):
        if cplx.is_split(a):
            return cplx.CArray(self.block_expand(a.re, geom),
                               self.block_expand(a.im, geom))
        for mu in range(4):
            a = jnp.repeat(a, geom.block[mu], axis=mu)
        t, z, y, x = self.geom.lattice
        return a.reshape(t, z, y * x)


def _transpose_any(a, axes):
    if cplx.is_split(a):
        return cplx.CArray(jnp.transpose(a.re, axes), jnp.transpose(a.im, axes))
    return jnp.transpose(a, axes)


def _stencil_split(s) -> bool:
    """Whether a stencil stores split-complex (CArray) operands."""
    if isinstance(s, CoarseStencilSoA):
        return cplx.is_split(s.Pk)
    if isinstance(s, (WilsonStencil, WilsonStencilSoA)):
        return cplx.is_split(s.links)
    return cplx.is_split(s.A)


def _add_diag(a, delta, diag_axes):
    """a + delta * I on the two (equal-length) axes `diag_axes` of a
    (possibly split) block tensor; delta is a traced real scalar."""
    d = a.shape[diag_axes[0]]
    nd = a.re.ndim if cplx.is_split(a) else a.ndim
    shape = [1] * nd
    shape[diag_axes[0]] = d
    shape[diag_axes[1]] = d
    eye = np.eye(d, dtype=np.float64)
    if diag_axes[0] > diag_axes[1]:
        eye = eye.T  # symmetric anyway; kept for clarity
    eye = eye.reshape(shape)
    if cplx.is_split(a):
        return cplx.CArray(a.re + delta * jnp.asarray(eye, a.re.dtype), a.im)
    return a + (delta * jnp.asarray(eye, a.real.dtype)).astype(a.dtype)


def shift_stencil(s, delta):
    """The stencil with self-coupling shifted by +delta * I, factored
    inverses recomputed -- the per-level body of the O(1) mass update
    (reference shift_update / operator_updates re-propagation,
    src/dirac_generic.c:504-551, src/dirac.c:321): since P^H P = I per
    aggregate x chirality, a fine-grid shift D + delta*I Galerkin-projects
    to EXACTLY A_c + delta*I on every coarse level, so no Galerkin rebuild
    (let alone bootstrap) is needed.  `delta` is a traced real scalar
    (jit-cached across scan values)."""
    if isinstance(s, WilsonStencil):
        clov = _add_diag(s.clover, delta, (-2, -1))
        return dataclasses.replace(s, clover=clov,
                                   clover_inv=cplx.herm_inv(clov))
    if isinstance(s, CoarseStencil):
        A = _add_diag(s.A, delta, (-2, -1))
        return dataclasses.replace(s, A=A, A_inv=cplx.inv(A))
    if isinstance(s, CoarseStencilSoA):
        from . import pallas_coarse as pc
        d = s.dof
        # packed d*d axis is j-major (row j*d + i): the diagonal i == j sits
        # at indices j*(d+1)
        eye_flat = np.zeros((d * d,), np.float64)
        eye_flat[np.arange(d) * (d + 1)] = 1.0
        shape = (1, d * d, 1) if s.layout == "t" else (1, 1, d * d, 1)
        split = cplx.is_split(s.Pk)
        rdt = s.Pk.re.dtype if split else np.zeros((), s.Pk.dtype).real.dtype
        eye = jnp.asarray(eye_flat.reshape(shape), rdt)
        if split:
            Pk = cplx.CArray(s.Pk.re.at[0].add(delta * eye), s.Pk.im)
        else:
            Pk = s.Pk.at[0].add((delta * eye).astype(s.Pk.dtype))
        A_log = pc.unpack_blocks(Pk[0:1], s.geom.lattice, s.layout)
        Pk_inv = pc.pack_blocks(cplx.inv(A_log[0])[None], s.layout)
        return dataclasses.replace(s, Pk=Pk, Pk_inv=Pk_inv)
    if isinstance(s, WilsonStencilSoA):
        from . import fast, pallas_dslash
        clov = _add_diag(s.clover, delta, (1, 2))
        nd = clov.re.ndim
        to_blk = [0] + list(range(3, nd)) + [1, 2]
        inv_l = cplx.herm_inv(_transpose_any(clov, to_blk))
        from_blk = [0, nd - 2, nd - 1] + list(range(1, nd - 2))
        clov_inv = _transpose_any(inv_l, from_blk)
        cdiag, coff = pallas_dslash.pack_clover(clov)
        cdiag_inv, coff_inv = pallas_dslash.pack_clover(clov_inv)
        return dataclasses.replace(s, clover=clov, clover_inv=clov_inv,
                                   cdiag=cdiag, coff=coff,
                                   cdiag_inv=cdiag_inv, coff_inv=coff_inv)
    raise TypeError(type(s))


def dense_inverse(s, rdtype=None, chunk=256):
    """Dense inverse of the stencil's full operator (for the coarsest-level
    direct solve, MGConfig.coarsest_direct).

    TPU rationale: the coarsest-level GCR runs tens of sequential,
    latency-bound iterations per V-cycle -- dozens of small HLOs each --
    while the whole coarsest problem is only n = sites x 2N_tv unknowns
    (8192 at a 4^4 coarsest with 16 test vectors).  A precomputed [n, n]
    inverse turns every coarsest solve into ONE MXU matvec.  The reference
    has no analog (its coarsest CPU GMRES is cheap relative to MPI ranks,
    src/coarse_oddeven_generic.c:1139); on TPU the trade flips.

    The matrix is materialized by applying the operator to the identity
    basis (chunked vmap -- layout/convention proof), and inverted via the
    real 2n x 2n embedding [[Re, -Im], [Im, Re]] whose inverse is
    [[X, -Y], [Y, X]] with X + iY = (Re + i Im)^-1 (the TPU runtime
    executes no complex HLOs).  `rdtype` optionally narrows the stored
    inverse (bf16 halves the HBM read per matvec; the coarsest tolerance
    is 5e-2, so ~4e-3 block noise is immaterial).
    """
    shape = s.field_shape
    n = int(np.prod(shape))
    split = _stencil_split(s)
    rdt = s.even.dtype

    def col(j):
        # basis column built from its index: no n x n identity lives in HBM
        oh = jnp.zeros((n,), rdt).at[j].set(1.0)
        e = cplx.CArray(oh, jnp.zeros_like(oh)) if split else oh.astype(s.dtype)
        return s.full_op(e.reshape(*shape)).reshape(-1)

    cols = jax.lax.map(col, jnp.arange(n, dtype=jnp.int32),
                       batch_size=min(n, chunk))
    return _invert_cols(cols, rdtype if split else None)


def _invert_cols(cols, rdtype):
    """Invert the operator materialized as cols[k] = D e_k.  Split-complex
    matrices go through the real 2k x 2k embedding [[Re, -Im], [Im, Re]]
    whose inverse is [[X, -Y], [Y, X]] with X + iY = (Re + i Im)^-1."""
    if cplx.is_split(cols):
        dre, dim = cols.re.T, cols.im.T      # D[i, k] = (D e_k)[i]
        k = dre.shape[0]
        if 2 * k > 8192:
            # XLA:TPU's LU panel workspace OOMs scoped VMEM beyond ~10k
            # real rows (measured: 14336 at 28 TVs refuses to compile) --
            # block Schur-complement recursion keeps every LU small
            inv = cplx.inv_blocked(cplx.CArray(dre, dim))
        else:
            r = jnp.block([[dre, -dim], [dim, dre]])
            rinv = jnp.linalg.inv(r)
            inv = cplx.CArray(rinv[:k, :k], rinv[k:, :k])
        return inv if rdtype is None else inv.astype_real(rdtype)
    return jnp.linalg.inv(cols.T)


def schur_even_indices(s) -> np.ndarray:
    """Flat indices of the even-site entries of the stencil's field layout
    (host-side, static per geometry; the compaction map for the Schur-
    complement direct solve)."""
    mask = np.broadcast_to(np.asarray(s.even), s.field_shape)
    return np.flatnonzero(mask.reshape(-1) > 0.5).astype(np.int32)


def dense_schur_inverse(s, idx, rdtype=None, chunk=256):
    """Dense inverse of the even-site Schur complement
    S = A_ee - h_eo A_oo^-1 h_oe (the operator the coarsest-level odd-even
    GCR iterates, coarse_solve_odd_even_PRECISION,
    src/coarse_oddeven_generic.c:1139) compacted to the n/2 even sites.

    vs the full dense_inverse: 1/4 the stored bytes and 1/4 the HBM read
    per coarsest solve, ~8x cheaper to (re)build at each setup, at the
    price of two extra stencil applies per solve (dense_schur_solve's
    elimination + reconstruction) -- the standard odd-even trade, applied
    to the direct solver.  idx = schur_even_indices(s)."""
    shape = s.field_shape
    n = int(np.prod(shape))
    split = _stencil_split(s)
    rdt = s.even.dtype

    def schur(v):
        ve = s.even * v
        return s.even * (s.self_op(ve) - s.hop(s.self_inv(s.hop(ve), s.odd)))

    def col(j):
        oh = jnp.zeros((n,), rdt).at[j].set(1.0)
        if split:
            e = cplx.CArray(oh, jnp.zeros_like(oh))
        else:
            e = oh.astype(s.dtype)
        out = schur(e.reshape(*shape)).reshape(-1)
        if split:
            return cplx.CArray(out.re[idx], out.im[idx])
        return out[idx]

    cols = jax.lax.map(col, jnp.asarray(idx),
                       batch_size=min(int(idx.shape[0]), chunk))
    return _invert_cols(cols, rdtype if split else None)


def dense_schur_solve(s, inv, idx, b):
    """Coarsest direct solve via the Schur inverse: odd elimination, ONE
    [n/2, n/2] matvec, odd reconstruction (all masked stencil applies)."""
    shape = s.field_shape
    n = int(np.prod(shape))
    b_e = s.even * (b - s.hop(s.self_inv(b, s.odd)))
    bf = b_e.reshape(-1)
    if cplx.is_split(bf):
        bc = cplx.CArray(bf.re[idx], bf.im[idx])
        if cplx.is_split(inv) and inv.re.dtype != bc.re.dtype:
            inv = inv.astype_real(bc.re.dtype)
        xc = cplx.einsum("ij,j->i", inv, bc)
        xe = cplx.CArray(jnp.zeros(n, xc.re.dtype).at[idx].set(xc.re),
                         jnp.zeros(n, xc.im.dtype).at[idx].set(xc.im))
    else:
        xc = inv @ bf[idx]
        xe = jnp.zeros(n, xc.dtype).at[idx].set(xc)
    x_e = xe.reshape(*shape)
    return x_e + s.self_inv(b - s.hop(x_e), s.odd)


def dense_solve(inv, b):
    """x = inv @ b with b in the stencil's field layout (one matvec)."""
    bf = b.reshape(-1)
    if cplx.is_split(inv) and inv.re.dtype != bf.re.dtype:
        # widen narrow-stored inverses at multiply time (fused by XLA;
        # accumulation stays in the field dtype)
        inv = inv.astype_real(bf.re.dtype)
    return cplx.einsum("ij,j->i", inv, bf).reshape(*b.shape)


# ---------------------------------------------------------------------------
# TPU fast-path fine stencil: split-complex SoA layout + Pallas Dslash
# ---------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=None)
def _cached_pallas_dslash(lattice, basis_name, interpret, mode="full"):
    from .pallas_dslash import build_dslash
    return build_dslash(lattice, basis_name=basis_name, interpret=interpret,
                        mode=mode)


@functools.lru_cache(maxsize=None)
def _cached_rollers(lattice, rdtype_name):
    from . import fast
    return fast.make_rollers(lattice, rdtype=jnp.dtype(rdtype_name))


def _interp() -> bool:
    """Pallas interpret mode on non-TPU backends (CPU mesh tests drive the
    production kernels without hardware)."""
    return jax.default_backend() != "tpu"


@partial(jax.tree_util.register_dataclass,
         data_fields=["links", "links_intra", "clover", "clover_inv",
                      "cdiag", "coff", "cdiag_inv", "coff_inv",
                      "even", "odd"],
         meta_fields=["geom", "use_pallas", "mesh"])
@dataclasses.dataclass(frozen=True)
class WilsonStencilSoA:
    """Fine-grid Wilson-clover stencil in the TPU-native SoA layout
    [dof..., T, Z, M=Y*X] (operators/fast.py), with the fused Pallas kernel
    (operators/pallas_dslash.py) as full_op on TPU.

    This is the production depth-0 compute path; the layout conversion at
    the multigrid boundary (to_logical/from_logical) is the analog of the
    reference's lexicographic<->Schwarz-layout translation
    (trans_PRECISION/trans_back_PRECISION, src/schwarz_generic.c:1807-1846).
    """

    links: object           # CArray [4,3,3,T,Z,M]
    links_intra: object
    clover: object          # CArray [2,6,6,T,Z,M]
    clover_inv: object
    cdiag: jnp.ndarray      # packed Hermitian clover (Pallas operands)
    coff: object
    cdiag_inv: jnp.ndarray  # packed clover inverse (Pallas self_inv)
    coff_inv: object
    even: jnp.ndarray       # [T,Z,M]
    odd: jnp.ndarray
    geom: Geometry
    use_pallas: bool
    # 4D device mesh: when set, ops run shard_map-local kernels + half-spinor
    # face corrections (parallel/shard_ops.py) -- the production multi-chip
    # path (reference d_plus_clover comm overlap, src/dirac_generic.c:188-262)
    mesh: object = None

    @classmethod
    def build(cls, op: WilsonOperator, geom: Geometry, dtype=None,
              use_pallas=None) -> "WilsonStencilSoA":
        from . import fast, pallas_dslash
        if dtype is not None:
            op = op.astype(dtype)
        if not cplx.is_split(op.links):
            op = op.split()
        rdtype = op.links.re.dtype
        if use_pallas is None:
            import os
            use_pallas = (jax.default_backend() == "tpu"
                          or bool(os.environ.get("DDAAMG_FORCE_PALLAS")))
        intra = op.links * jnp.asarray(_link_intra_mask(geom), dtype=rdtype)
        links = fast.links_to_soa(op.links)
        clover = fast.clover_to_soa(op.clover)
        clover_inv = fast.clover_to_soa(cplx.herm_inv(op.clover))
        cdiag, coff = pallas_dslash.pack_clover(clover)
        cdiag_inv, coff_inv = pallas_dslash.pack_clover(clover_inv)
        par = (np.indices(geom.lattice).sum(axis=0) % 2 == 0).astype(np.float64)
        return cls(
            links=links,
            links_intra=fast.links_to_soa(intra),
            clover=clover,
            clover_inv=clover_inv,
            cdiag=cdiag, coff=coff,
            cdiag_inv=cdiag_inv, coff_inv=coff_inv,
            even=fast.lattice_mask_to_soa(par, rdtype),
            odd=fast.lattice_mask_to_soa(1.0 - par, rdtype),
            geom=geom, use_pallas=bool(use_pallas))

    @classmethod
    def build_chunked(cls, op: WilsonOperator, geom: Geometry, dtype=None,
                      use_pallas=None, slab_sites: int = 2 ** 17
                      ) -> "WilsonStencilSoA":
        """Memory-lean build for LARGE lattices: the one-program build()
        holds ~25 clover-sized live temporaries (measured 32 GB of HBM
        demand at 32^4) because herm_inv/packing/relayout all trace into a
        single XLA program.  Here the per-site clover transforms run as
        jitted T-SLAB programs (peak extra memory ~= a few slabs) and the
        results are concatenated; link relayouts are separate programs.
        Output is IDENTICAL to build() (same kernels, same layout)."""
        from . import fast, pallas_dslash
        if dtype is not None:
            op = op.astype(dtype)
        if not cplx.is_split(op.links):
            op = op.split()
        rdtype = op.links.re.dtype
        if use_pallas is None:
            import os
            use_pallas = (jax.default_backend() == "tpu"
                          or bool(os.environ.get("DDAAMG_FORCE_PALLAS")))
        t = geom.lattice[0]
        sites_per_t = int(np.prod(geom.lattice[1:]))
        tc = max(1, min(t, slab_sites // max(sites_per_t, 1)))
        while t % tc:
            tc -= 1

        @jax.jit
        def _links_soa(lk):
            return fast.links_to_soa(lk)

        @jax.jit
        def _intra_soa(lk, mask):
            return fast.links_to_soa(lk * mask)

        @jax.jit
        def _clover_slab(cl):
            soa = fast.clover_to_soa(cl)
            inv = fast.clover_to_soa(cplx.herm_inv(cl))
            cd, co = pallas_dslash.pack_clover(soa)
            cdi, coi = pallas_dslash.pack_clover(inv)
            return soa, inv, cd, co, cdi, coi

        parts = [_clover_slab(op.clover[i * tc:(i + 1) * tc])
                 for i in range(t // tc)]

        def cat(k, axis):
            xs = [p[k] for p in parts]
            if cplx.is_split(xs[0]):
                return cplx.concatenate(xs, axis=axis)
            return jnp.concatenate(xs, axis=axis)

        # SoA clover axes: [2,6,6,T,Z,M] -> T at 3; packed [2,k,T,Z,M] -> 2
        clover, clover_inv = cat(0, 3), cat(1, 3)
        cdiag, coff = cat(2, 2), cat(3, 2)
        cdiag_inv, coff_inv = cat(4, 2), cat(5, 2)
        links = _links_soa(op.links)
        intra = _intra_soa(op.links,
                           jnp.asarray(_link_intra_mask(geom), dtype=rdtype))
        par = (np.indices(geom.lattice).sum(axis=0) % 2 == 0).astype(np.float64)
        return cls(
            links=links, links_intra=intra,
            clover=clover, clover_inv=clover_inv,
            cdiag=cdiag, coff=coff,
            cdiag_inv=cdiag_inv, coff_inv=coff_inv,
            even=fast.lattice_mask_to_soa(par, rdtype),
            odd=fast.lattice_mask_to_soa(1.0 - par, rdtype),
            geom=geom, use_pallas=bool(use_pallas))

    # --- operator interface ---

    @property
    def dtype(self):
        return self.links.dtype

    @property
    def field_shape(self):
        t, z, y, x = self.geom.lattice
        return (4, 3, t, z, y * x)

    def _roll(self):
        return _cached_rollers(self.geom.lattice, str(self.links.re.dtype))

    def full_op(self, v):
        from . import fast
        if self.mesh is not None:
            from ..parallel.shard_ops import wilson_sharded
            return wilson_sharded(self, v, "full")
        if self.use_pallas:
            fn = _cached_pallas_dslash(self.geom.lattice, None, _interp())
            return fn(self.links, self.cdiag, self.coff, v)
        return fast.d_plus_clover_soa(self.links, self.clover, v, self._roll())

    def block_op(self, v):
        from . import fast
        if self.mesh is not None:
            from ..parallel.shard_ops import wilson_sharded
            return wilson_sharded(self, v, "block")
        if self.use_pallas:
            # the block (Schwarz) operator IS the fused kernel with the
            # boundary-masked links (reference SSE block_d_plus_clover,
            # src/sse_dirac_generic.c:27-124)
            fn = _cached_pallas_dslash(self.geom.lattice, None, _interp())
            return fn(self.links_intra, self.cdiag, self.coff, v)
        return (fast.clover_apply_soa(self.clover, v)
                + fast.dslash_hopping_soa(self.links_intra, v, self._roll()))

    def self_op(self, v):
        from . import fast
        if self.mesh is not None:
            from ..parallel.shard_ops import wilson_sharded
            return wilson_sharded(self, v, "self")
        if self.use_pallas:
            fn = _cached_pallas_dslash(self.geom.lattice, None, _interp(),
                                       mode="clover")
            return fn(self.cdiag, self.coff, v)
        return fast.clover_apply_soa(self.clover, v)

    def self_inv(self, v, mask):
        from . import fast
        if self.mesh is not None:
            from ..parallel.shard_ops import wilson_sharded
            return wilson_sharded(self, v, "self_inv", mask=mask)
        if self.use_pallas:
            # packed-inverse clover application (reference site Cholesky
            # solves, src/sse_oddeven_generic.c:208)
            fn = _cached_pallas_dslash(self.geom.lattice, None, _interp(),
                                       mode="clover")
            return fn(self.cdiag_inv, self.coff_inv, mask * v)
        return fast.clover_apply_soa(self.clover_inv, mask * v)

    def hop_intra(self, v):
        from . import fast
        if self.mesh is not None:
            from ..parallel.shard_ops import wilson_sharded
            return wilson_sharded(self, v, "hop_intra")
        if self.use_pallas:
            fn = _cached_pallas_dslash(self.geom.lattice, None, _interp(),
                                       mode="hop")
            return fn(self.links_intra, v)
        return fast.dslash_hopping_soa(self.links_intra, v, self._roll())

    # --- layout hooks (SAP smoother / MG boundary) ---

    def to_logical(self, v):
        from . import fast
        return fast.spinor_from_soa(v, self.geom.lattice)

    def from_logical(self, v):
        from . import fast
        return fast.spinor_to_soa(v)

    def to_logical_batch(self, vs):
        """[N, 4, 3, T, Z, Y*X] -> [N, T, Z, Y, X, 4, 3] as one transpose
        (avoids the 128x tile-padded per-vector stack, see _LogicalLayout)."""
        t, z, y, x = self.geom.lattice
        n = vs.shape[0]
        a = vs.reshape(n, 4, 3, t, z, y, x)
        return _transpose_any(a, (0, 3, 4, 5, 6, 1, 2))

    def from_logical_batch(self, vs):
        t, z, y, x = vs.shape[1:5]
        n = vs.shape[0]
        return _transpose_any(vs, (0, 5, 6, 1, 2, 3, 4)).reshape(
            n, 4, 3, t, z, y * x)

    def lattice_mask(self, mask_np):
        from . import fast
        rdtype = np.zeros((), np.dtype(self.dtype)).real.dtype
        return fast.lattice_mask_to_soa(np.asarray(mask_np), rdtype)

    def dof_sum(self, a):
        return cplx.sum_dof(a, (0, 1))

    def block_sum(self, a, geom: Geometry):
        gt, gz, gy, gx = geom.block_grid
        bt, bz, by, bx = geom.block
        if cplx.is_split(a):
            return cplx.CArray(self.block_sum(a.re, geom),
                               self.block_sum(a.im, geom))
        return a.reshape(gt, bt, gz, bz, gy, by, gx, bx).sum(axis=(1, 3, 5, 7))

    def block_expand(self, a, geom: Geometry):
        """[gt,gz,gy,gx] block values -> [T,Z,M] (trailing-broadcasts
        against SoA fields)."""
        if cplx.is_split(a):
            return cplx.CArray(self.block_expand(a.re, geom),
                               self.block_expand(a.im, geom))
        for mu in range(4):
            a = jnp.repeat(a, geom.block[mu], axis=mu)
        t, z, y, x = self.geom.lattice
        return a.reshape(t, z, y * x)
