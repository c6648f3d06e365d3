"""Multigrid hierarchy: level construction, V-/K-cycles, coarsest solver,
and the adaptive (bootstrap) setup.

Reference call paths rebuilt here:
  * initial hierarchy: coarse_grid_correction_PRECISION_setup
    (src/setup_generic.c:29-108) -- at every level: random test vectors
    smoothed with 1,2,3 SAP cycles (interpolation_PRECISION_define,
    src/setup_generic.c:215-236), aggregate-QR -> P, Galerkin coarse operator,
    recurse;
  * cycles: vcycle_PRECISION (src/vcycle_generic.c:91-141) with K-cycle
    FGMRES wrappers on intermediate levels (kcycle_tol/length/restarts) and
    the odd-even Schur GMRES coarsest solver
    (coarse_solve_odd_even_PRECISION, src/coarse_oddeven_generic.c:1139);
  * bootstrap: inv_iter_inv_fcycle_PRECISION (src/setup_generic.c:441-503)
    with test_vector_PRECISION_update (:429) pulling coarse-level solutions
    out of the cycle, re_setup_PRECISION (:278) rebuilding P and D_c, and
    F-cycle scaled recursion into coarser levels.

The reference's "gathering" (idle ranks on coarse levels) has no TPU
equivalent component: coarse arrays are simply small; under a device mesh
XLA re-shards or replicates them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..geometry import Geometry
from ..operators.coarse import CoarseOperator
from ..operators.stencil import CoarseStencil, WilsonStencil, WilsonStencilSoA
from ..operators.wilson import WilsonOperator
from ..smoothers.sap import SchwarzPreconditioner
from ..solvers.device_gmres import device_gcr
from .galerkin import build_coarse_operator
from .interpolation import Aggregation, build_interpolation, interpolate, restrict


from functools import partial


@partial(jax.jit, static_argnames=("agg", "geom", "n", "soa", "layout"))
def _resetup_kernel(stencil, op_galerkin, tvs, agg, geom, n: int,
                    soa: bool = False, layout: str = "t"):
    """One coarsening rebuild as a single device program: test vectors ->
    logical layout -> aggregate-QR interpolation -> Galerkin triple product
    -> coarse stencil (incl. factorized inverses).  Eagerly this is
    hundreds of tiny dispatches (fatal on a ~26 ms/dispatch TPU relay);
    jitted it is one.  soa selects the packed dof-major coarse layout (the
    TPU AoSoA analog, operators/stencil.py CoarseStencilSoA); `layout`
    picks its packed variant ("tz" keeps Z shardable for z-sharded
    meshes)."""
    from ..operators.stencil import CoarseStencilSoA
    tvs_log = stencil.to_logical_batch(tvs)
    P = build_interpolation(agg, tvs_log)
    cop = build_coarse_operator(op_galerkin, agg, P)
    if soa:
        return P, CoarseStencilSoA.build(cop, geom, layout=layout)
    return P, CoarseStencil.build(cop, geom)


@partial(jax.jit, static_argnames=("agg", "n"))
def _interp_kernel(stencil, tvs, agg, n: int):
    tvs_log = stencil.to_logical_batch(tvs)
    return build_interpolation(agg, tvs_log)


@partial(jax.jit, static_argnames=("agg", "kind", "mu", "static_cols"))
def _galerkin_piece_kernel(op_galerkin, P, agg, kind: str, mu: int,
                           static_cols: bool = True):
    """static_cols=True unrolls the 2N basis columns (one live fine field
    at a time -- the 32^4 memory-lean form, but 2N unrolled op bodies to
    compile); False lax.maps over the materialized basis (small trace,
    fast compile -- right when the basis fits HBM, e.g. 16^4 x 28 TVs)."""
    from .galerkin import galerkin_piece
    return galerkin_piece(op_galerkin, agg, P, kind, mu,
                          static_cols=static_cols)


@partial(jax.jit, static_argnames=("geom", "soa", "layout"))
def _coarse_stencil_kernel(cop, geom, soa: bool, layout: str):
    from ..operators.stencil import CoarseStencilSoA
    if soa:
        return CoarseStencilSoA.build(cop, geom, layout=layout)
    return CoarseStencil.build(cop, geom)


def _resetup_any(stencil, op_galerkin, tvs, agg, geom, n: int,
                 soa: bool = False, layout: str = "t"):
    """One coarsening rebuild: the fused single-program _resetup_kernel on
    ordinary volumes; on LARGE levels the interpolation, each of the nine
    Galerkin coupling pieces, and the coarse stencil run as separate
    programs -- the fused build's live set is ~66 GB at 32^4.

    "Large" is judged by the TILE-PADDED size of one masked operator
    coupling array inside the fused program (XLA pads the [.., d, d]-minor
    logical blocks to (8, 128) tiles: 8x at d=16): the fused program holds
    a handful of them.  16^4 fine (d=12) and 8^4 d=56 coarse levels stay
    fused (the measured-good r3 paths); 32^4 fine and 16^4 d=16 coarse go
    piece-wise."""
    sites = int(np.prod(agg.fine_lattice))
    if isinstance(op_galerkin, WilsonOperator):
        # n-aware: the fused program's live set AND compile time scale with
        # the number of test vectors (n logical TVs + n columns of P +
        # Galerkin temps), not just the site count.  Measured on the chip:
        # 16^4 x 16 TVs compiles/runs well fused; 16^4 x 28 TVs takes the
        # XLA backend >10 min to compile (r4: then OOMed at runtime) --
        # the piece-wise path compiles in seconds per piece.
        big = sites > 200_000 or sites * n > 1_500_000
    else:
        d = int(op_galerkin.A.shape[-1])
        big = (sites * ((d + 7) // 8 * 8) * 128 * 8 > 500_000_000
               or sites * d * n > 4_000_000)
    import os
    if os.environ.get("DDAAMG_FORCE_PIECEWISE_RESETUP"):
        big = True     # testability: exercise the piece-wise path small
    if not big:
        return _resetup_kernel(stencil, op_galerkin, tvs, agg, geom, n,
                               soa=soa, layout=layout)
    P = _interp_kernel(stencil, tvs, agg, n)
    # the "A" piece as one program (self + 8 hop directions) still demands
    # 36 GB at 32^4: one direction per program.  Truly-large lattices use
    # the unrolled one-column-live form; smaller lattices that are only
    # here because of a large TV count keep the lax.map form (the 2N-column
    # unroll is a compile-time cost, the materialized basis fits HBM).
    sc = sites > 200_000
    A = _galerkin_piece_kernel(op_galerkin, P, agg, "A_self", 0,
                               static_cols=sc)
    for mu in range(4):
        A = A + _galerkin_piece_kernel(op_galerkin, P, agg, "A_fwd", mu,
                                       static_cols=sc)
        A = A + _galerkin_piece_kernel(op_galerkin, P, agg, "A_bwd", mu,
                                       static_cols=sc)
    Df = cplx.stack([_galerkin_piece_kernel(op_galerkin, P, agg, "Df", mu,
                                            static_cols=sc)
                     for mu in range(4)])
    Db = cplx.stack([_galerkin_piece_kernel(op_galerkin, P, agg, "Db", mu,
                                            static_cols=sc)
                     for mu in range(4)])
    from ..operators.coarse import CoarseOperator
    cop = CoarseOperator(A=A, Df=Df, Db=Db)
    d = A.shape[-1]
    if soa and int(np.prod(geom.lattice)) * d * d > 16_000_000:
        # big coarse level: the one-program pack/inverse build tile-pads
        # its [.., d, d]-minor intermediates 8x (4.5 GB at 16^4 d=16)
        from ..operators.stencil import CoarseStencilSoA
        return P, CoarseStencilSoA.build_chunked(cop, geom, layout=layout)
    return P, _coarse_stencil_kernel(cop, geom, soa, layout)


@jax.jit
def _normalize(v):
    return v * jax.lax.rsqrt(cplx.norm2(v))


@jax.jit
def _normalize_batch(vs):
    return jax.vmap(_normalize)(vs)


def _prof(name: str, depth: int, fn):
    """Run fn() under a profiling region (setup-phase observability -- the
    reference profiles its setup too, prof_print src/solver_analysis.c:65)."""
    from ..profiling import PROF
    if not PROF.enabled:
        return fn()
    import time as _time
    t0 = _time.perf_counter()
    out = fn()
    if PROF.sync:
        jax.block_until_ready(out)
    PROF.add(name, depth, _time.perf_counter() - t0)
    return out


@partial(jax.jit, static_argnames=("cycles_seq", "block_iter", "odd_even",
                                   "chunk"))
def _initial_smooth_batch(stencil, colors, tvs_logical, cycles_seq,
                          block_iter, odd_even, chunk: int = 0):
    """All initial test vectors' progressive SAP smoothing (1, 2, 3 cycles)
    in ONE device program (vmapped over the TV batch; one dispatch instead
    of 3N).  chunk > 0 bounds the vmapped width (lax.map) -- at 32^4 the
    full-width batch of sweep temporaries exceeds HBM."""
    from ..smoothers.sap import sap_smooth

    def one(v):
        v = stencil.from_logical(v).astype(stencil.dtype)
        for ncy in cycles_seq:
            v = sap_smooth(stencil, colors, v, ncy, block_iter, odd_even)
        return _normalize(v)

    if chunk:
        return jax.lax.map(one, tvs_logical, batch_size=chunk)
    return jax.vmap(one)(tvs_logical)


@partial(jax.jit, static_argnames=("rdtype",))
def _dense_inverse_kernel(stencil, rdtype=None):
    from ..operators.stencil import dense_inverse
    return dense_inverse(stencil, rdtype=rdtype)


@partial(jax.jit, static_argnames=("rdtype",))
def _dense_schur_kernel(stencil, idx, rdtype=None):
    from ..operators.stencil import dense_schur_inverse
    return dense_schur_inverse(stencil, idx, rdtype=rdtype)


@partial(jax.jit, static_argnames=("geom", "dtype", "soa"))
def _fine_stencil_kernel(op, geom, dtype, soa: bool):
    """Depth-0 stencil build as ONE device program (eagerly: ~100 tiny
    dispatches for herm_inv + SoA relayouts + clover packing, seconds of
    fixed cost on a ~27 ms-dispatch TPU relay)."""
    cls = WilsonStencilSoA if soa else WilsonStencil
    return cls.build(op, geom, dtype=dtype)


def _replicate_constraint(v, mesh):
    """Force a traced field to the replicated layout (the gathering step at
    a sharded->replicated level boundary; one all-gather of a tiny coarse
    field, reference vector_PRECISION_gather src/gathering_generic.c:285)."""
    from jax.sharding import NamedSharding, PartitionSpec
    f = lambda a: jax.lax.with_sharding_constraint(
        a, NamedSharding(mesh, PartitionSpec()))
    if cplx.is_split(v):
        return cplx.CArray(f(v.re), f(v.im))
    return f(v)


@jax.jit
def _shift_kernel(stencil, delta):
    from ..operators.stencil import shift_stencil
    return shift_stencil(stencil, delta)


@jax.jit
def _gram_schmidt_kernel(tvs):
    n = tvs.shape[0]
    mat = cplx.moveaxis(tvs.reshape(n, -1), 0, -1)  # [vol, N]
    q = cplx.block_qr(mat, passes=1)
    return cplx.moveaxis(q, -1, 0).reshape(*tvs.shape)


@dataclasses.dataclass
class LevelConfig:
    """Per-level parameters (reference ini `d<i> ...` keys)."""

    lattice: tuple
    block: tuple = (2, 2, 2, 2)
    post_smooth_iter: int = 2
    block_iter: int = 4
    num_test_vectors: int = 20
    setup_iter: int = 4
    n_cy: int = 1  # preconditioner cycles


@dataclasses.dataclass
class MGConfig:
    """Solver-wide parameters (reference ini global keys)."""

    levels: list
    kcycle: bool = True
    kcycle_tol: float = 1e-1
    kcycle_length: int = 5
    kcycle_restarts: int = 2
    coarse_tol: float = 5e-2
    coarse_iter: int = 100
    coarse_restart: int = 5
    odd_even: bool = True
    scheme: str = "red_black"   # Schwarz variant (reference method 1/2/3)
    dtype: object = jnp.complex64
    split: bool = False         # split-complex representation (TPU path)
    seed: int = 42
    # depth-0 field layout: "logical" [T,Z,Y,X,4,3], "soa" [4,3,T,Z,M]
    # (the TPU fast path + Pallas Dslash), or "auto" (soa iff split)
    fine_layout: str = "auto"
    # coarse-level layout: "logical" [T,Z,Y,X,d(,d)] (site-major batched
    # matmuls) or "soa" [d(,d),T,Z,M] (dof-major VPU elementwise -- the
    # reference's AoSoA analog); "auto" follows the fine layout
    coarse_layout: str = "auto"
    # 4D device mesh (parallel.make_solver_mesh) for production multi-device
    # solves: fine/intermediate levels are sharded by domain decomposition,
    # the coarsest level is replicated (the reference's "gathering" analog,
    # src/gathering_generic.c:44-209).  None = single device.
    mesh: object = None
    # store coarse-level stencil blocks in bfloat16 (fields/accumulation
    # stay in `dtype`): halves the HBM traffic of the coarse applies that
    # dominate TPU solve time.  Setup/Galerkin always run full precision;
    # only the traced-cycle view of each coarse stencil is compressed.
    coarse_block_bf16: bool = False
    # replace the coarsest-level GCR with a precomputed dense inverse
    # (operators/stencil.dense_inverse): tens of latency-bound Krylov
    # iterations per cycle become ONE MXU matvec.  Rebuilt by re_setup;
    # only sensible while sites x 2N_tv stays a few thousand.
    coarsest_direct: bool = False
    # exact per-block Schwarz solves on COARSE levels (depth>0) for the
    # post-setup traced cycle: the reference's local MinRes block solver
    # (block_iter stencil sweeps per solve) becomes ONE batched
    # [nb, m, m] matvec against precomputed block inverses -- measured
    # 28-TV depth-1 smoothing is ~30 ms of a 33 ms cycle via MinRes.
    # Setup keeps the MinRes smoother (reference bootstrap behavior);
    # inverses are built lazily at the first post-setup cycle.
    smoother_direct: bool = False
    # intermediate-level gathering threshold (reference idle-rank gathering,
    # src/gathering_generic.c:44-209): an intermediate level whose per-device
    # site count under the mesh falls below this is REPLICATED instead of
    # sharded -- its ops become latency-free local compute and only the tiny
    # restrict/interpolate boundary pays one collective.  The coarsest level
    # is always replicated.
    min_local_sites: int = 256

    @property
    def use_soa(self):
        if self.fine_layout == "auto":
            return self.split
        return self.fine_layout == "soa"

    @property
    def use_coarse_soa(self):
        if self.coarse_layout == "auto":
            return self.use_soa
        return self.coarse_layout == "soa"

    @property
    def num_levels(self):
        return len(self.levels)


@dataclasses.dataclass
class MGLevel:
    depth: int
    geom: Geometry
    cfg: LevelConfig
    stencil: object                      # WilsonStencil(SoA) | CoarseStencil
    smoother: Optional[SchwarzPreconditioner] = None
    agg: Optional[Aggregation] = None    # to next level
    P: Optional[jnp.ndarray] = None
    test_vectors: Optional[jnp.ndarray] = None  # [N, *field] (stencil layout)
    next: Optional["MGLevel"] = None
    galerkin_op: Optional[object] = None  # depth-0 logical-layout operator
    # (source_stencil, compressed_stencil) cache for coarse_block_bf16
    cycle_stencil: Optional[tuple] = None
    # [n, n] inverse of the full coarsest operator (coarsest_direct)
    dense_inv: Optional[object] = None
    # [nb, m, m] Schwarz-block inverses (MGConfig.smoother_direct)
    block_inv: Optional[object] = None
    # under a mesh: True when this level's arrays are replicated instead of
    # sharded (coarsest always; intermediates below min_local_sites --
    # the reference's idle-rank gathering analog)
    replicated: bool = False

    @property
    def is_coarsest(self):
        return self.next is None

    @property
    def dof_shape(self):
        """dof shape of the LOGICAL layout at this level."""
        if isinstance(self.stencil, (WilsonStencil, WilsonStencilSoA)):
            return (4, 3)
        from ..operators.stencil import CoarseStencilSoA
        if isinstance(self.stencil, CoarseStencilSoA):
            return (self.stencil.dof,)
        return self.stencil.field_shape[4:]

    def tvs_logical(self):
        """Test vectors in logical layout (for P / checkpoint IO)."""
        return self.stencil.to_logical_batch(self.test_vectors)

    def operator_for_galerkin(self):
        if self.galerkin_op is not None:
            return self.galerkin_op
        if isinstance(self.stencil, WilsonStencil):
            return WilsonOperator(self.stencil.links, self.stencil.clover)
        return self.stencil.cop


class Multigrid:
    """The full AMG preconditioner: hierarchy + cycles + adaptive setup."""

    def __init__(self, op: WilsonOperator, mg_cfg: MGConfig):
        self.cfg = mg_cfg
        self.stats = {"coarse_iterations": 0, "coarse_solves": 0,
                      "coarse_matvecs": 0, "coarsest_inverse_applies": 0}
        # the SoA fast path always runs split-complex internally; the
        # representation is converted at the preconditioner boundary
        self._split = mg_cfg.split or mg_cfg.use_soa
        if self._split and not cplx.is_split(op.links):
            op = op.split()
        self._cycle_jit = None
        self._inner_jit = None
        self._inner_batch_jit = None
        self._setup_batch_jit = None
        self._2lvl_jit = None
        self._defer_dense = False
        # packed coarse-block layout: "tz" keeps Z an unfused shardable axis
        # (operators/pallas_coarse.py) when the mesh shards z
        self._coarse_layout = ("tz" if mg_cfg.mesh is not None
                               and mg_cfg.mesh.shape["z"] > 1 else "t")
        self.fine = self._build(op)

    # ------------------------------------------------------------------
    # hierarchy construction
    # ------------------------------------------------------------------

    def _level_local_sites(self, level: MGLevel) -> int:
        """Per-device site count this level would have if sharded."""
        from ..operators.stencil import CoarseStencilSoA
        from ..parallel.shard_ops import local_lattice as soa_local
        mesh = self.cfg.mesh
        lat = level.geom.lattice
        if isinstance(level.stencil, (WilsonStencilSoA, CoarseStencilSoA)):
            return int(np.prod(soa_local(mesh, lat)))
        loc = [lat[mu] // mesh.shape[ax]
               if lat[mu] % mesh.shape[ax] == 0 else lat[mu]
               for mu, ax in enumerate(("t", "z", "y", "x"))]
        return int(np.prod(loc))

    def _shard_level(self, level: MGLevel):
        """Apply the production distribution to a level's arrays: 4D domain
        decomposition on large levels; REPLICATION on the coarsest and on
        any intermediate level whose per-device volume falls below
        min_local_sites (the reference's idle-rank gathering,
        src/gathering_generic.c:44-209: coarse levels run on rank subsets
        because sharding tiny problems is all latency; on TPU the idiomatic
        subset is "every device, redundantly")."""
        mesh = self.cfg.mesh
        if mesh is None:
            return
        from .. import parallel
        # coarsest = last configured level (level.next may not be linked yet
        # during the build loop)
        last = level.depth == self.cfg.num_levels - 1 and level.depth > 0
        small = (level.depth > 0 and not last
                 and self._level_local_sites(level) < self.cfg.min_local_sites)
        level.replicated = bool(last or small)
        from ..operators.stencil import CoarseStencilSoA
        is_soa = isinstance(level.stencil, (WilsonStencilSoA, CoarseStencilSoA))
        if level.replicated:
            level.stencil = parallel.replicate_stencil(mesh, level.stencil)
            shard_f = lambda v, **_: parallel.replicate(mesh, v)
            shard_tv = shard_f
        else:
            level.stencil = parallel.shard_stencil(mesh, level.stencil)
            shard_f = lambda v: parallel.shard_field(
                mesh, v, level.geom.lattice, soa=is_soa)
            shard_tv = lambda v: parallel.shard_stacked_field(
                mesh, v, level.geom.lattice, soa=is_soa)
        if level.smoother is not None:
            level.smoother.replace_stencil(level.stencil)
            level.smoother.colors = tuple(
                shard_f(c) for c in level.smoother.colors)
        if level.test_vectors is not None:
            level.test_vectors = shard_tv(level.test_vectors)
        if level.P is not None:
            level.P = parallel.shard_interpolation(
                mesh, level.P, level.agg.coarse_lattice)

    def _build(self, op: WilsonOperator) -> MGLevel:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        levels: list[MGLevel] = []
        for d, lc in enumerate(cfg.levels):
            geom = Geometry(lattice=tuple(lc.lattice), block=tuple(lc.block))
            galerkin_op = None
            if d == 0:
                if cfg.use_soa and int(np.prod(lc.lattice)) > 200_000:
                    # large lattices: the one-program build's ~25 live
                    # clover temporaries OOM HBM (32 GB at 32^4); slab it
                    stencil = WilsonStencilSoA.build_chunked(
                        op, geom, dtype=cfg.dtype)
                else:
                    stencil = _fine_stencil_kernel(op, geom, cfg.dtype,
                                                   soa=cfg.use_soa)
                if cfg.use_soa:
                    galerkin_op = op.astype(cfg.dtype)
            else:
                prev = levels[-1]
                agg = Aggregation(
                    fine_lattice=prev.geom.lattice,
                    coarsening=tuple(prev.geom.lattice[mu] // lc.lattice[mu]
                                     for mu in range(4)),
                    num_vectors=prev.cfg.num_test_vectors,
                    fine_dpc=int(np.prod(prev.dof_shape)) // 2,
                )
                prev.agg = agg
                key, sub = jax.random.split(key)
                prev.test_vectors = self._initial_test_vectors(levels[-1], sub)
                prev.P, stencil = _resetup_any(
                    prev.stencil, prev.operator_for_galerkin(),
                    prev.test_vectors, agg, geom,
                    prev.cfg.num_test_vectors, soa=cfg.use_coarse_soa,
                    layout=self._coarse_layout)
                if cfg.mesh is not None:
                    from .. import parallel
                    prev.P = parallel.shard_interpolation(
                        cfg.mesh, prev.P, agg.coarse_lattice)
            level = MGLevel(depth=d, geom=geom, cfg=lc, stencil=stencil,
                            galerkin_op=galerkin_op)
            if d < cfg.num_levels - 1:
                # reference: block odd-even solver at depth 0 only
                level.smoother = SchwarzPreconditioner(
                    stencil, block_iter=lc.block_iter, cycles=lc.post_smooth_iter,
                    odd_even=(d == 0 and cfg.odd_even), scheme=cfg.scheme)
            if levels:
                levels[-1].next = level
            levels.append(level)
            self._shard_level(level)
        return levels[0]

    def _ensure_dense_inv(self):
        """Lazily build the coarsest-level dense inverse (coarsest_direct):
        the even-site Schur-complement inverse when odd-even applies (1/4
        the bytes, ~8x cheaper to build), else the full inverse.

        Built on first use and INVALIDATED (not rebuilt) whenever re_setup
        replaces the coarsest stencil; during the bootstrap the build is
        deferred entirely (_defer_dense) so the setup's coarsest solves run
        the GCR path -- matching the reference's setup behavior and saving
        setup_iter+1 rebuilds of a matrix only the final operator needs."""
        if not self.cfg.coarsest_direct or self._defer_dense:
            return
        lvl = self._levels()[-1]
        if lvl.depth == 0 or lvl.dense_inv is not None:
            return
        rdtype = (jnp.bfloat16 if self.cfg.coarse_block_bf16 and self._split
                  else None)
        if self.cfg.odd_even and all(e % 2 == 0 for e in lvl.geom.lattice):
            from ..operators.stencil import schur_even_indices
            idx = jnp.asarray(schur_even_indices(lvl.stencil))
            lvl.dense_inv = (_prof(
                "setup: coarsest dense inverse", lvl.depth,
                lambda: _dense_schur_kernel(lvl.stencil, idx,
                                            rdtype=rdtype)), idx)
        else:
            lvl.dense_inv = _prof(
                "setup: coarsest dense inverse", lvl.depth,
                lambda: _dense_inverse_kernel(lvl.stencil, rdtype=rdtype))

    def _initial_test_vectors(self, level: MGLevel, key) -> jnp.ndarray:
        """Random vectors progressively smoothed with 1, 2, 3 SAP cycles
        (reference interpolation_PRECISION_define, src/setup_generic.c:215-246)."""
        n = level.cfg.num_test_vectors
        # draw in the LOGICAL shape so the random stream is identical across
        # level layouts (SoA vs logical give bit-identical hierarchies)
        shape = (n, *level.geom.lattice, *level.dof_shape)
        ka, kb = jax.random.split(key)
        rdtype = np.zeros((), np.dtype(self.cfg.dtype)).real.dtype
        re = jax.random.normal(ka, shape, dtype=rdtype)
        im = jax.random.normal(kb, shape, dtype=rdtype)
        if self._split:
            tv = cplx.CArray(re, im)
        else:
            tv = jax.lax.complex(re, im).astype(self.cfg.dtype)
        if self.cfg.mesh is not None:
            from .. import parallel
            tv = parallel.shard_stacked_field(self.cfg.mesh, tv,
                                              level.geom.lattice, soa=False)
        sm = level.smoother
        # vmapped over the TV batch -> einsum view, not Pallas (see
        # _level_data_batched)
        s = level.stencil
        if getattr(s, "use_pallas", False):
            s = dataclasses.replace(s, use_pallas=False)
        vol = int(np.prod(level.geom.lattice))
        chunk = 0 if vol * n <= 4_000_000 else max(1, 4_000_000 // vol)
        return _prof(
            "setup: initial tv smoothing", level.depth,
            lambda: _initial_smooth_batch(s, sm.colors, tv,
                                          (1, 2, 3), sm.block_iter,
                                          sm.odd_even, chunk=chunk))

    # ------------------------------------------------------------------
    # cycles -- ONE traced computation per preconditioner application
    # ------------------------------------------------------------------
    # The reference runs its K-cycle / coarse GMRES loops on the host CPU
    # where host and compute are the same device.  On TPU every host-driven
    # iteration pays a dispatch round-trip, so the whole multilevel cycle
    # (smoothers, K-cycles, coarsest Schur solve) is traced into a single
    # XLA program: inner Krylov loops are device_gcr (lax.fori_loop),
    # recursion over levels is unrolled at trace time (static depth).

    def _levels(self) -> list:
        out, lvl = [], self.fine
        while lvl is not None:
            out.append(lvl)
            lvl = lvl.next
        return out

    def _cycle_view(self, lvl: MGLevel):
        """The stencil the traced cycle sees at this level: the production
        stencil, or (coarse_block_bf16) a block-compressed copy, cached and
        invalidated by identity whenever re_setup/sharding replaces the
        stencil."""
        if (not self.cfg.coarse_block_bf16 or lvl.depth == 0
                or not self._split or not hasattr(lvl.stencil, "compress")):
            return lvl.stencil
        if lvl.cycle_stencil is None or lvl.cycle_stencil[0] is not lvl.stencil:
            lvl.cycle_stencil = (lvl.stencil, lvl.stencil.compress())
        return lvl.cycle_stencil[1]

    def _ensure_block_inv(self):
        """Lazily build coarse-level Schwarz-block inverses
        (MGConfig.smoother_direct).  Deferred during the bootstrap
        (_defer_dense): setup cycles keep the reference's MinRes block
        solver, and inverses of intermediate hierarchies would be thrown
        away by the next re_setup anyway."""
        if not self.cfg.smoother_direct or self._defer_dense:
            return
        from ..smoothers.sap import build_block_inverse
        rdtype = (jnp.bfloat16 if self.cfg.coarse_block_bf16 and self._split
                  else None)
        for lvl in self._levels():
            if lvl.depth == 0 or lvl.smoother is None \
                    or lvl.block_inv is not None:
                continue
            binv = _prof("setup: block inverses", lvl.depth,
                         lambda l=lvl: build_block_inverse(l.stencil))
            if rdtype is not None and cplx.is_split(binv):
                binv = binv.astype_real(rdtype)
            lvl.block_inv = binv

    def _level_data(self):
        """The hierarchy's array content as a pytree (jit argument) --
        stencils are rebuilt by re_setup, so they must be arguments, not
        trace-time constants."""
        self._ensure_dense_inv()
        self._ensure_block_inv()
        return tuple(
            {"stencil": self._cycle_view(lvl), "P": lvl.P,
             "dense_inv": lvl.dense_inv, "block_inv": lvl.block_inv,
             "colors": None if lvl.smoother is None else lvl.smoother.colors}
            for lvl in self._levels())

    def _level_data_batched(self):
        """Cycle views for BATCHED device programs (vmapped multi-RHS
        restarts and the vmapped setup sweeps): Pallas kernels are swapped
        for the XLA dot_general path over the SAME packed arrays.  A
        pallas_call under jax.vmap gets a fresh grid axis per lane and
        re-streams every stencil block once PER LANE -- at B=12 that turns
        the HBM-bound coarse/fine applies into 12x the traffic (measured:
        1.28x multi-RHS speedup instead of ~B/latency).  The batched
        einsum reads each block once and contracts it with all B lanes as
        an MXU (d x d) @ (d x B)-shaped dot, which is what multi-RHS is
        FOR."""
        out = []
        for dd in self._level_data():
            s = dd["stencil"]
            if getattr(s, "use_pallas", False):
                s = dataclasses.replace(s, use_pallas=False)
            out.append({**dd, "stencil": s})
        return tuple(out)

    def _coarsest_solve_traced(self, s, geom, b, tol, dense_inv=None):
        """Odd-even Schur GCR on the coarsest level, fully on device
        (coarse_solve_odd_even_PRECISION, src/coarse_oddeven_generic.c:1139);
        or, with coarsest_direct, one matvec with the precomputed inverse.
        b and the result are in the level's STENCIL layout.

        Returns (x, counters[3]) with counters = [gcr_iterations,
        coarsest operator applications (matvec equivalents), dense-inverse
        applies] -- the second slot keeps coarse WORK comparable with the
        reference's coarse-grid-iteration average (72.55 on sample.ini,
        src/linsolve_generic.c:363-374) even when coarsest_direct replaces
        the GCR with one inverse apply."""
        cfg = self.cfg
        if dense_inv is not None:
            from ..operators.stencil import dense_schur_solve, dense_solve
            if isinstance(dense_inv, tuple):
                inv, idx = dense_inv
                return (dense_schur_solve(s, inv, idx, b),
                        jnp.array([1.0, 0.0, 1.0], jnp.float32))
            return (dense_solve(dense_inv, b),
                    jnp.array([1.0, 0.0, 1.0], jnp.float32))
        use_oe = cfg.odd_even and all(e % 2 == 0 for e in geom.lattice)
        if use_oe:
            hop = s.hop

            def schur(v):
                ve = s.even * v
                return s.even * (s.self_op(ve) - hop(s.self_inv(hop(ve), s.odd)))

            b_e = s.even * (b - hop(s.self_inv(b, s.odd)))
            x_e, iters, _, _ = device_gcr(schur, b_e, m=cfg.coarse_iter,
                                          tol=tol, n_restarts=cfg.coarse_restart)
            x_e = s.even * x_e
            x = x_e + s.self_inv(b - hop(x_e), s.odd)
        else:
            x, iters, _, _ = device_gcr(s.full_op, b, m=cfg.coarse_iter,
                                        tol=tol, n_restarts=cfg.coarse_restart)
        # matvec equivalents: one operator apply per GCR iteration plus one
        # initial-residual apply per restart sweep
        matv = iters + jnp.float32(cfg.coarse_restart)
        return x, jnp.stack([iters, matv, jnp.float32(0.0)])

    def _cycle(self, data, depth: int, eta, kcycle_tol: float, x=None,
               collect=None):
        """One preconditioning cycle at `depth` (vcycle_PRECISION,
        src/vcycle_generic.c:91-141); traceable.  Returns (x, coarse_iters).

        `collect` (a dict, trace-level) receives the coarse-level solutions
        reachable at the top level of the cycle -- solutions computed inside
        the K-cycle's preconditioner loop stay in the loop carry and are not
        collected (the bootstrap recursion refreshes those levels anyway)."""
        cfg = self.cfg
        levels = self._levels()
        level, nxt = levels[depth], levels[depth + 1]
        s = data[depth]["stencil"]
        # [gcr_iters, coarsest matvec equivalents, dense-inverse applies]
        citers = jnp.zeros(3, jnp.float32)
        for _ in range(level.cfg.n_cy):
            r = eta if x is None else eta - s.full_op(x)
            # layout boundary: SoA fields -> logical for P^H / P
            # (reference trans_back analog); the next level works in ITS
            # stencil layout (identity for the logical coarse layout)
            ns = data[depth + 1]["stencil"]
            b_c = ns.from_logical(
                restrict(level.agg, data[depth]["P"], s.to_logical(r)))
            if nxt.replicated and cfg.mesh is not None:
                b_c = _replicate_constraint(b_c, cfg.mesh)
            if nxt.is_coarsest:
                x_cs, it = self._coarsest_solve_traced(
                    ns, nxt.geom, b_c, cfg.coarse_tol,
                    dense_inv=data[depth + 1].get("dense_inv"))
                citers = citers + it
            elif cfg.kcycle:
                def kprec(v, _d=depth + 1):
                    z, it = self._cycle(data, _d, v, kcycle_tol)
                    return z, it

                x_cs, _, _, inner = device_gcr(
                    ns.full_op, b_c,
                    m=cfg.kcycle_length, tol=kcycle_tol,
                    n_restarts=cfg.kcycle_restarts, prec=kprec,
                    aux_zero=jnp.zeros(3, jnp.float32))
                citers = citers + inner
            else:
                x_cs, it = self._cycle(data, depth + 1, b_c, kcycle_tol,
                                       collect=collect)
                citers = citers + it
            if collect is not None:
                collect[depth + 1] = x_cs     # next level's stencil layout
            corr = s.from_logical(
                interpolate(level.agg, data[depth]["P"], ns.to_logical(x_cs),
                            level.dof_shape))
            x = corr if x is None else x + corr
            from ..smoothers.sap import sap_smooth_from
            x = sap_smooth_from(s, data[depth]["colors"], eta, x,
                                cycles=level.cfg.post_smooth_iter,
                                block_iter=level.cfg.block_iter,
                                odd_even=(depth == 0 and cfg.odd_even),
                                block_inv=data[depth].get("block_inv"))
        return x, citers

    def _cycle_entry(self, data, eta, depth: int, kcycle_tol: float,
                     want_collect: bool):
        """Full preconditioner application.  At depth 0 this includes the
        layout and representation conversion at the boundary (the
        reference's trans_float/trans_back_float,
        src/schwarz_generic.c:1807-1846)."""
        collect = {} if want_collect else None
        if depth > 0:
            x, citers = self._cycle(data, depth, eta, kcycle_tol,
                                    collect=collect)
            return x, citers, (collect if want_collect else {})
        s = data[0]["stencil"]
        split_in = cplx.is_split(eta)
        if self._split and not split_in:
            eta = cplx.as_carray(eta)
        v = s.from_logical(eta).astype(self.cfg.dtype)
        x, citers = self._cycle(data, 0, v, kcycle_tol, collect=collect)
        out = s.to_logical(x)
        if not split_in and cplx.is_split(out):
            out = jax.lax.complex(out.re, out.im)
        return out, citers, (collect if want_collect else {})

    def _run_cycle(self, eta, kcycle_tol=None, want_collect=False, depth=0):
        if self._cycle_jit is None:
            self._cycle_jit = jax.jit(
                self._cycle_entry,
                static_argnames=("depth", "kcycle_tol", "want_collect"))
        ktol = float(kcycle_tol if kcycle_tol is not None else self.cfg.kcycle_tol)
        if self.cfg.num_levels - depth <= 2:
            ktol = 0.0  # no K-cycle below this depth: avoid retraces
        return self._cycle_jit(self._level_data(), eta, depth=depth,
                               kcycle_tol=ktol, want_collect=want_collect)

    def __call__(self, eta):
        """Depth-0 preconditioner application M(eta) -- ONE device dispatch."""
        out, citers, _ = self._run_cycle(eta)
        # lazy device-side accumulation; fetched when stats are read
        self.stats["coarse_iterations"] = (
            self.stats["coarse_iterations"] + citers[0])
        self.stats["coarse_matvecs"] = (
            self.stats["coarse_matvecs"] + citers[1])
        self.stats["coarsest_inverse_applies"] = (
            self.stats["coarsest_inverse_applies"] + citers[2])
        self.stats["coarse_solves"] += 1
        return out

    def _inner_restart_impl(self, data, r, rel_tol, m: int):
        """One full mixed-precision inner restart as a single device
        program: m iterations of flexible GCR over the fine operator,
        preconditioned by the multigrid cycle, frozen once the residual
        drops below rel_tol (a traced scalar -- the remaining reduction the
        f64 outer loop still needs)."""
        s = data[0]["stencil"]
        split_in = cplx.is_split(r)
        if self._split and not split_in:
            r = cplx.as_carray(r)
        v = s.from_logical(r).astype(self.cfg.dtype)

        def prec(w):
            return self._cycle(data, 0, w, float(self.cfg.kcycle_tol))

        z, iters, _, citers = device_gcr(s.full_op, v, m=m, tol=rel_tol,
                                         n_restarts=1, prec=prec,
                                         aux_zero=jnp.zeros(3, jnp.float32))
        out = s.to_logical(z)
        if not split_in and cplx.is_split(out):
            out = jax.lax.complex(out.re, out.im)
        return out, iters, citers

    def inner_restart(self, r, rel_tol, m: int):
        """Mixed-precision inner restart (see api.Solver mp=2 on TPU):
        returns (z, inner_iters, coarse_iters) -- all device values."""
        if self._inner_jit is None:
            self._inner_jit = jax.jit(self._inner_restart_impl,
                                      static_argnames=("m",))
        return self._inner_jit(self._level_data(), r,
                               jnp.float32(rel_tol), m=m)

    def inner_restart_batch(self, r, rel_tols, m: int):
        """Vmapped inner restarts for multiple right-hand sides: ALL systems
        advance inside ONE device program (api.Solver.solve_multi).  TPU
        rationale: a propagator solve is 12 independent RHS; batching turns
        the coarse-level (2N x 2N) matvecs into (B, 2N, 2N) batched matmuls
        the MXU runs at full tilt, and pays the relay dispatch cost once for
        the whole batch instead of once per RHS.  The reference has no
        multi-RHS path (SURVEY 2.14.8).

        r: stacked logical fields [B, T,Z,Y,X,4,3]; rel_tols: [B] per-system
        relative targets (converged lanes pass 1.0 and freeze immediately
        inside the vmapped early-exit while_loop)."""
        if self._inner_batch_jit is None:
            def impl(data, rb, tb, m):
                return jax.vmap(
                    lambda rr, tt: self._inner_restart_impl(data, rr, tt, m)
                )(rb, tb)
            self._inner_batch_jit = jax.jit(impl, static_argnames=("m",))
        return self._inner_batch_jit(self._level_data_batched(), r,
                                     jnp.asarray(rel_tols, jnp.float32), m=m)

    # ------------------------------------------------------------------
    # adaptive (bootstrap) setup
    # ------------------------------------------------------------------

    def bootstrap_setup(self, setup_iter: Optional[int] = None):
        """inv_iter_inv_fcycle_PRECISION: refine test vectors with the
        current hierarchy, rebuilding P / D_c each iteration."""
        it = setup_iter if setup_iter is not None else self.cfg.levels[0].setup_iter
        if self.cfg.num_levels < 2 or it <= 0:
            return
        # defer the coarsest dense inverse: setup's coarsest solves run the
        # GCR path (the reference's setup behavior); built lazily at the
        # first post-setup cycle instead of rebuilt every re_setup
        self._defer_dense = True
        try:
            self._inv_iter_fcycle(self.fine, it)
        finally:
            self._defer_dense = False

    def twolevel_extension_setup(self, setup_iter: Optional[int] = None):
        """interpolation mode 1: inv_iter_2lvl_extension_setup_PRECISION
        (src/setup_generic.c:324-416).  Per setup iteration, each test
        vector gets one *plain two-level* inverse-iteration update: coarse
        GMRES solve of P^H tv on the immediate next level (unpreconditioned;
        odd-even Schur when the next level is coarsest), interpolation, then
        post-smoothing toward tv; P and D_c are rebuilt one coarsening at a
        time, and the procedure recurses level by level."""
        it = setup_iter if setup_iter is not None else self.cfg.levels[0].setup_iter
        if self.cfg.num_levels < 2 or it <= 0:
            return
        self._defer_dense = True
        try:
            self._inv_iter_2lvl(self.fine, it)
        finally:
            self._defer_dense = False

    def _twolevel_update_one(self, data, depth: int, tv):
        """One mode-1 update of a single test vector at `depth` (traced)."""
        cfg = self.cfg
        levels = self._levels()
        level, nxt = levels[depth], levels[depth + 1]
        s = data[depth]["stencil"]
        ns = data[depth + 1]["stencil"]
        b_c = ns.from_logical(
            restrict(level.agg, data[depth]["P"], s.to_logical(tv)))
        if nxt.replicated and cfg.mesh is not None:
            b_c = _replicate_constraint(b_c, cfg.mesh)
        if nxt.is_coarsest:
            x_c, _ = self._coarsest_solve_traced(
                ns, nxt.geom, b_c, cfg.coarse_tol,
                dense_inv=data[depth + 1].get("dense_inv"))
        else:
            # plain (unpreconditioned) coarse GMRES, reference gmres built
            # with prec=_NOTHING (setup_generic.c:335-336)
            x_c, _, _, _ = device_gcr(ns.full_op, b_c, m=cfg.coarse_iter,
                                      tol=cfg.coarse_tol,
                                      n_restarts=cfg.coarse_restart)
        buf = s.from_logical(
            interpolate(level.agg, data[depth]["P"], ns.to_logical(x_c),
                        level.dof_shape))
        from ..smoothers.sap import sap_smooth_from
        buf = sap_smooth_from(s, data[depth]["colors"], tv, buf,
                              cycles=level.cfg.post_smooth_iter,
                              block_iter=level.cfg.block_iter,
                              odd_even=(depth == 0 and cfg.odd_even),
                              block_inv=data[depth].get("block_inv"))
        return buf * (1.0 / jnp.sqrt(cplx.norm2(buf)))

    def _inv_iter_2lvl(self, level: MGLevel, setup_iter: int):
        # the per-TV updates within one iteration are independent (P/D_c
        # rebuild only after the sweep): vmap them into one device program
        if self._2lvl_jit is None:
            def impl(data, depth, tvs):
                return jax.vmap(
                    lambda tv: self._twolevel_update_one(data, depth, tv)
                )(tvs)
            self._2lvl_jit = jax.jit(impl, static_argnames=("depth",))
        for _k in range(setup_iter):
            level.test_vectors = self._2lvl_jit(
                self._level_data_batched(), level.depth, level.test_vectors)
            self.re_setup(level, depth_only=True)
        if not level.next.is_coarsest:
            self._inv_iter_2lvl(level.next, setup_iter)

    def _gram_schmidt(self, tvs):
        return _gram_schmidt_kernel(tvs)

    def _setup_cycles_batch(self, level: MGLevel, tvs):
        """The bootstrap cycles for ALL of a level's test vectors as ONE
        vmapped device program (tvs and results in the level's stencil
        layout; kcycle_tol = coarse_tol during setup, src/setup_generic.c:448).

        The reference's inv_iter i-loop (src/setup_generic.c:427-459) has no
        cross-TV dependency inside one bootstrap iteration -- coarser-level
        TV collection and re_setup happen after the whole sweep -- so the N
        cycles vmap cleanly.  On TPU this pays the ~26 ms relay dispatch
        once per bootstrap iteration instead of once per test vector and
        batches every cycle matmul over the TV axis (setup is the dominant
        fixed cost of a solve; reference 8^4 setup: 85.9 s single-core)."""
        cfg = self.cfg
        ktol = float(cfg.coarse_tol)
        if cfg.num_levels - level.depth <= 2:
            ktol = 0.0  # mirror _run_cycle's no-K-cycle clamp (no retraces)
        if self._setup_batch_jit is None:
            def impl(data, tvs, depth, kcycle_tol, chunk):
                def one(tv):
                    if depth == 0:
                        s = data[0]["stencil"]
                        x_log, _, collect = self._cycle_entry(
                            data, s.to_logical(tv), depth=0,
                            kcycle_tol=kcycle_tol, want_collect=True)
                        return s.from_logical(x_log), collect
                    x, _, collect = self._cycle_entry(
                        data, tv, depth=depth, kcycle_tol=kcycle_tol,
                        want_collect=True)
                    return x, collect
                if chunk:
                    # large volumes: bound the vmapped width (the full-TV
                    # batch of cycle temporaries OOMs HBM at 32^4)
                    return jax.lax.map(one, tvs, batch_size=chunk)
                return jax.vmap(one)(tvs)
            self._setup_batch_jit = jax.jit(
                impl, static_argnames=("depth", "kcycle_tol", "chunk"))
        vol = int(np.prod(level.geom.lattice))
        n = int(level.cfg.num_test_vectors)
        chunk = 0 if vol * n <= 2_000_000 else max(1, 2_000_000 // vol)
        return self._setup_batch_jit(self._level_data_batched(), tvs,
                                     depth=level.depth, kcycle_tol=ktol,
                                     chunk=chunk)

    def _inv_iter_fcycle(self, level: MGLevel, setup_iter: int):
        cfg = self.cfg
        for j in range(setup_iter):
            level.test_vectors = _prof(
                "setup: gram schmidt", level.depth,
                lambda: self._gram_schmidt(level.test_vectors))
            xs, collect = _prof(
                "setup: tv cycles (F-cycle)", level.depth,
                lambda: self._setup_cycles_batch(level, level.test_vectors))
            level.test_vectors = _normalize_batch(xs)
            # update coarser-level test vectors from the cycles' coarse
            # solutions (test_vector_PRECISION_update), all TVs at once
            n = level.cfg.num_test_vectors
            lvl = level.next
            while lvl is not None and not lvl.is_coarsest:
                if lvl.depth in collect and lvl.test_vectors is not None:
                    k = min(n, lvl.test_vectors.shape[0])
                    xc = collect[lvl.depth]
                    lvl.test_vectors = lvl.test_vectors.at[:k].set(
                        _normalize_batch(xc[:k]))
                lvl = lvl.next
            _prof("setup: P/Galerkin rebuild", level.depth,
                  lambda: self.re_setup(level))
            if level.depth == 0 and not level.next.is_coarsest:
                sub = max(1, round((j + 1) * level.next.cfg.setup_iter / setup_iter))
                self._inv_iter_fcycle(level.next, sub)
        if level.depth > 0 and not level.next.is_coarsest:
            sub = max(1, round(level.next.cfg.setup_iter * setup_iter
                               / max(1, level.cfg.setup_iter)))
            self._inv_iter_fcycle(level.next, sub)

    def slim_for_solve(self):
        """Release arrays a finished hierarchy does not need for SOLVES,
        for HBM-tight very large problems (the 32^4 single-chip ladder
        step: ~15 GB resident after setup leaves no trace/workspace
        headroom).  Drops: test vectors (only future setup iterations read
        them), the fine stencil's einsum-view clover pair (the Pallas path
        reads the packed form; batched multi-RHS einsum views are
        unavailable afterwards), and replaces coarse stencils with their
        bf16-compressed cycle views (coarse_block_bf16).  After this,
        update_setup()/re_setup are invalid until a fresh setup()."""
        import gc
        for lvl in self._levels():
            lvl.test_vectors = None
            lvl.galerkin_op = None
            if isinstance(lvl.stencil, WilsonStencilSoA) \
                    and lvl.stencil.use_pallas:
                lvl.stencil = dataclasses.replace(
                    lvl.stencil, clover=None, clover_inv=None)
                if lvl.smoother is not None:
                    lvl.smoother.replace_stencil(lvl.stencil)
            if lvl.cycle_stencil is not None:
                lvl.stencil = lvl.cycle_stencil[1]
                lvl.cycle_stencil = (lvl.stencil, lvl.stencil)
                if lvl.smoother is not None:
                    lvl.smoother.replace_stencil(lvl.stencil)
        # drop cached setup jits: their closures/constvars pin device
        # arrays from the build phase
        self._setup_batch_jit = None
        self._2lvl_jit = None
        jax.clear_caches()
        gc.collect()

    def shift_update(self, delta: float):
        """O(1) mass-shift propagation through the whole hierarchy
        (reference shift_update, src/dirac_generic.c:504-551 via
        src/dirac.c:321): every level's self-coupling gets +delta * I (the
        Galerkin projection of a fine-grid shift is exactly diagonal since
        P^H P = I), factored inverses are recomputed, and the coarsest dense
        inverse is invalidated for lazy rebuild.  NO bootstrap, NO Galerkin
        triple product -- microseconds of device work where a full setup()
        pays minutes."""
        rdtype = np.zeros((), np.dtype(self.cfg.dtype)).real.dtype
        d = jnp.asarray(float(delta), rdtype)
        for lvl in self._levels():
            lvl.stencil = _shift_kernel(lvl.stencil, d)
            if lvl.smoother is not None:
                lvl.smoother.replace_stencil(lvl.stencil)
            lvl.cycle_stencil = None
            lvl.dense_inv = None
            lvl.block_inv = None
            if lvl.galerkin_op is not None:
                from ..operators.wilson import shift_diagonal
                lvl.galerkin_op = shift_diagonal(lvl.galerkin_op, float(delta))

    def set_test_vectors(self, tvs):
        """Install depth-0 test vectors (e.g. from a checkpoint file) and
        rebuild the hierarchy (reference read_tv_from_file_PRECISION,
        src/setup_generic.c:131-162, interpolation: 4)."""
        from ..utils import device_put_complex
        tvs = device_put_complex(np.asarray(tvs), dtype=self.cfg.dtype,
                                 split=self._split)
        want = self.fine.cfg.num_test_vectors
        assert tvs.shape[0] == want, (tvs.shape, want)
        lat = self.fine.geom.lattice
        s = self.fine.stencil
        tvs = tvs.reshape(want, *lat, 4, 3)  # logical layout from file
        if self.cfg.mesh is not None:
            from .. import parallel
            tvs = parallel.shard_stacked_field(self.cfg.mesh, tvs, lat)
        self.fine.test_vectors = s.from_logical_batch(tvs)
        self.re_setup(self.fine)

    def get_test_vectors(self) -> np.ndarray:
        """Depth-0 test vectors as numpy in logical layout (checkpointing)."""
        from ..utils import device_get_complex
        return device_get_complex(self.fine.tvs_logical())

    def re_setup(self, level: MGLevel, depth_only: bool = False):
        """Rebuild P and the Galerkin operator from `level` downward
        (re_setup_PRECISION); depth_only rebuilds just this one coarsening
        (the mode-1 setup's per-level rebuild, src/setup_generic.c:373-390)."""
        mesh = self.cfg.mesh
        lvl = level
        while lvl is not None and not lvl.is_coarsest:
            nxt = lvl.next
            lvl.P, nxt.stencil = _resetup_any(
                lvl.stencil, lvl.operator_for_galerkin(), lvl.test_vectors,
                lvl.agg, nxt.geom, lvl.cfg.num_test_vectors,
                soa=self.cfg.use_coarse_soa, layout=self._coarse_layout)
            if mesh is not None:
                from .. import parallel
                lvl.P = parallel.shard_interpolation(mesh, lvl.P,
                                                     lvl.agg.coarse_lattice)
            if nxt.smoother is not None:
                nxt.smoother.replace_stencil(nxt.stencil)
            self._shard_level(nxt)
            nxt.block_inv = None       # stale vs the rebuilt stencil
            if nxt.is_coarsest:
                nxt.dense_inv = None   # stale vs the rebuilt stencil
            if depth_only:
                break
            lvl = nxt
