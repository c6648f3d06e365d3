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
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..geometry import Geometry
from ..operators.coarse import CoarseOperator, coarse_hop
from ..operators.stencil import CoarseStencil, WilsonStencil, WilsonStencilSoA
from ..operators.wilson import WilsonOperator
from ..smoothers.sap import SchwarzPreconditioner
from ..solvers import fgmres
from .galerkin import build_coarse_operator
from .interpolation import Aggregation, build_interpolation, interpolate, restrict


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

    @property
    def use_soa(self):
        if self.fine_layout == "auto":
            return self.split
        return self.fine_layout == "soa"

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

    @property
    def is_coarsest(self):
        return self.next is None

    @property
    def dof_shape(self):
        """dof shape of the LOGICAL layout at this level."""
        if isinstance(self.stencil, (WilsonStencil, WilsonStencilSoA)):
            return (4, 3)
        return self.stencil.field_shape[4:]

    def tvs_logical(self):
        """Test vectors in logical layout (for P / checkpoint IO)."""
        s = self.stencil
        n = self.test_vectors.shape[0]
        return cplx.stack([s.to_logical(self.test_vectors[i]) for i in range(n)])

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
        self.stats = {"coarse_iterations": 0, "coarse_solves": 0}
        # the SoA fast path always runs split-complex internally; the
        # representation is converted at the preconditioner boundary
        self._split = mg_cfg.split or mg_cfg.use_soa
        if self._split and not cplx.is_split(op.links):
            op = op.split()
        self.fine = self._build(op)

    # ------------------------------------------------------------------
    # hierarchy construction
    # ------------------------------------------------------------------

    def _build(self, op: WilsonOperator) -> MGLevel:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        levels: list[MGLevel] = []
        for d, lc in enumerate(cfg.levels):
            geom = Geometry(lattice=tuple(lc.lattice), block=tuple(lc.block))
            galerkin_op = None
            if d == 0:
                if cfg.use_soa:
                    stencil = WilsonStencilSoA.build(op, geom, dtype=cfg.dtype)
                    galerkin_op = op.astype(cfg.dtype)
                else:
                    stencil = WilsonStencil.build(op, geom, dtype=cfg.dtype)
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
                prev.P = build_interpolation(agg, prev.tvs_logical())
                cop = build_coarse_operator(prev.operator_for_galerkin(), agg, prev.P)
                stencil = CoarseStencil.build(cop, geom)
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
        return levels[0]

    def _initial_test_vectors(self, level: MGLevel, key) -> jnp.ndarray:
        """Random vectors progressively smoothed with 1, 2, 3 SAP cycles
        (reference interpolation_PRECISION_define, src/setup_generic.c:215-246)."""
        n = level.cfg.num_test_vectors
        # draw in the LOGICAL shape so the random stream is identical across
        # fine-level layouts (SoA vs logical give bit-identical hierarchies)
        if isinstance(level.stencil, WilsonStencilSoA):
            shape = (n, *level.geom.lattice, 4, 3)
        else:
            shape = (n, *level.stencil.field_shape)
        ka, kb = jax.random.split(key)
        rdtype = np.zeros((), np.dtype(self.cfg.dtype)).real.dtype
        re = jax.random.normal(ka, shape, dtype=rdtype)
        im = jax.random.normal(kb, shape, dtype=rdtype)
        if self._split:
            tv = cplx.CArray(re, im)
        else:
            tv = jax.lax.complex(re, im).astype(self.cfg.dtype)
        out = []
        for i in range(n):
            v = level.stencil.from_logical(tv[i])
            for ncy in (1, 2, 3):
                v = level.smoother(v, cycles=ncy)
            v = v * (1.0 / jnp.sqrt(cplx.norm2(v)))
            out.append(v)
        return cplx.stack(out)

    # ------------------------------------------------------------------
    # cycles
    # ------------------------------------------------------------------

    def _coarsest_solve(self, level: MGLevel, b, tol=None, collect=None):
        """Odd-even Schur GMRES on the coarsest level
        (coarse_solve_odd_even_PRECISION)."""
        import time as _time

        from ..profiling import PROF
        _t0 = _time.perf_counter()
        cfg = self.cfg
        s = level.stencil
        tol = tol if tol is not None else cfg.coarse_tol
        use_oe = cfg.odd_even and all(e % 2 == 0 for e in level.geom.lattice)
        if use_oe:
            def hop(v):
                return coarse_hop(s.Df, s.Db, v)

            def schur(v):
                ve = s.even * v
                return s.even * (s.self_op(ve) - hop(s.self_inv(hop(ve), s.odd)))

            b_e = s.even * (b - hop(s.self_inv(b, s.odd)))
            res = fgmres(schur, b_e, tol=tol, restart_length=cfg.coarse_iter,
                         max_restarts=cfg.coarse_restart)
            x_e = s.even * res.x
            x = x_e + s.self_inv(b - hop(x_e), s.odd)
        else:
            res = fgmres(s.full_op, b, tol=tol, restart_length=cfg.coarse_iter,
                         max_restarts=cfg.coarse_restart)
            x = res.x
        self.stats["coarse_iterations"] += res.iterations
        self.stats["coarse_solves"] += 1
        PROF.add("coarsest_solve (OE-GMRES)", level.depth,
                 _time.perf_counter() - _t0)
        if collect is not None:
            collect[level.depth] = x
        return x

    def vcycle(self, level: MGLevel, eta, x=None, kcycle_tol=None, collect=None):
        """One preconditioning cycle at `level` (vcycle_PRECISION)."""
        cfg = self.cfg
        nxt = level.next
        for i in range(level.cfg.n_cy):
            r = eta if x is None else eta - level.stencil.full_op(x)
            # layout boundary: SoA fine fields -> logical for P^H
            # (reference trans_back analog)
            b_c = restrict(level.agg, level.P, level.stencil.to_logical(r))
            if nxt.is_coarsest:
                x_c = self._coarsest_solve(nxt, b_c, collect=collect)
            elif cfg.kcycle:
                ktol = kcycle_tol if kcycle_tol is not None else cfg.kcycle_tol
                res = fgmres(
                    nxt.stencil.full_op, b_c, tol=ktol,
                    restart_length=cfg.kcycle_length,
                    max_restarts=cfg.kcycle_restarts,
                    preconditioner=lambda v: self.vcycle(
                        nxt, v, kcycle_tol=kcycle_tol, collect=collect),
                )
                x_c = res.x
                if collect is not None:
                    collect[nxt.depth] = x_c
            else:
                x_c = self.vcycle(nxt, b_c, kcycle_tol=kcycle_tol, collect=collect)
                if collect is not None:
                    collect[nxt.depth] = x_c
            corr = level.stencil.from_logical(
                interpolate(level.agg, level.P, x_c, level.dof_shape))
            x = corr if x is None else x + corr
            import time as _time

            from ..profiling import PROF
            _t0 = _time.perf_counter()
            x = level.smoother.smooth(eta, x, cycles=level.cfg.post_smooth_iter)
            PROF.add("smoother (SAP)", level.depth, _time.perf_counter() - _t0)
        return x

    def __call__(self, eta):
        """Depth-0 preconditioner application M(eta).

        eta arrives in the outer solver's logical layout/precision; the
        conversion to the fine stencil's layout + cfg.dtype here and back at
        exit is the reference's trans_float/trans_back_float boundary
        (src/schwarz_generic.c:1807-1846, preconditioner.c:25-69)."""
        s = self.fine.stencil
        split_in = cplx.is_split(eta)
        if self._split and not split_in:
            eta = cplx.as_carray(eta)
        out = s.to_logical(self.vcycle(
            self.fine, s.from_logical(eta).astype(self.cfg.dtype)))
        if not split_in and cplx.is_split(out):
            out = jax.lax.complex(out.re, out.im)
        return out

    # ------------------------------------------------------------------
    # adaptive (bootstrap) setup
    # ------------------------------------------------------------------

    def bootstrap_setup(self, setup_iter: Optional[int] = None):
        """inv_iter_inv_fcycle_PRECISION: refine test vectors with the
        current hierarchy, rebuilding P / D_c each iteration."""
        it = setup_iter if setup_iter is not None else self.cfg.levels[0].setup_iter
        if self.cfg.num_levels < 2 or it <= 0:
            return
        self._inv_iter_fcycle(self.fine, it)

    def _gram_schmidt(self, tvs):
        n = tvs.shape[0]
        mat = cplx.moveaxis(tvs.reshape(n, -1), 0, -1)  # [vol, N]
        q = cplx.block_qr(mat, passes=1)
        return cplx.moveaxis(q, -1, 0).reshape(*tvs.shape)

    def _inv_iter_fcycle(self, level: MGLevel, setup_iter: int):
        cfg = self.cfg
        for j in range(setup_iter):
            level.test_vectors = self._gram_schmidt(level.test_vectors)
            new_tvs = []
            for i in range(level.cfg.num_test_vectors):
                collect: dict[int, jnp.ndarray] = {}
                # kcycle_tol = coarse_tol during setup (src/setup_generic.c:448)
                x = self.vcycle(level, level.test_vectors[i],
                                kcycle_tol=cfg.coarse_tol, collect=collect)
                new_tvs.append(x * (1.0 / jnp.sqrt(cplx.norm2(x))))
                # update coarser-level test vectors from the cycle's coarse
                # solutions (test_vector_PRECISION_update)
                lvl = level.next
                while lvl is not None and not lvl.is_coarsest:
                    if lvl.depth in collect and lvl.test_vectors is not None:
                        xc = collect[lvl.depth]
                        lvl.test_vectors = lvl.test_vectors.at[i].set(
                            xc * (1.0 / jnp.sqrt(cplx.norm2(xc))))
                    lvl = lvl.next
            level.test_vectors = cplx.stack(new_tvs)
            self.re_setup(level)
            if level.depth == 0 and not level.next.is_coarsest:
                sub = max(1, round((j + 1) * level.next.cfg.setup_iter / setup_iter))
                self._inv_iter_fcycle(level.next, sub)
        if level.depth > 0 and not level.next.is_coarsest:
            sub = max(1, round(level.next.cfg.setup_iter * setup_iter
                               / max(1, level.cfg.setup_iter)))
            self._inv_iter_fcycle(level.next, sub)

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
        self.fine.test_vectors = cplx.stack(
            [s.from_logical(tvs[i]) for i in range(want)])
        self.re_setup(self.fine)

    def get_test_vectors(self) -> np.ndarray:
        """Depth-0 test vectors as numpy in logical layout (checkpointing)."""
        from ..utils import device_get_complex
        return device_get_complex(self.fine.tvs_logical())

    def re_setup(self, level: MGLevel):
        """Rebuild P and the Galerkin operator from `level` downward
        (re_setup_PRECISION)."""
        lvl = level
        while lvl is not None and not lvl.is_coarsest:
            lvl.P = build_interpolation(lvl.agg, lvl.tvs_logical())
            cop = build_coarse_operator(lvl.operator_for_galerkin(), lvl.agg, lvl.P)
            nxt = lvl.next
            nxt.stencil = CoarseStencil.build(cop, nxt.geom)
            if nxt.smoother is not None:
                nxt.smoother.replace_stencil(nxt.stencil)
            lvl = nxt
