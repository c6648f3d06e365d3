"""Library-embedding API, mirroring the reference C API (dd_alpha_amg.h:42-84):
init / set_conf / setup / setup_update / wilson_solve / preconditioner / free.

Usage:

    from ddalphaamg_tpu import api, config
    params = config.parse_ini("sample.ini")        # or build SolverParams
    solver = api.Solver(params)
    plaq = solver.set_conf(U)                       # U[4,T,Z,Y,X,3,3] raw links
    status = solver.setup()                         # hierarchy + bootstrap
    x, info = solver.solve(rhs, tol=1e-10)

The reference's conf_index_fct/vector_index_fct user-layout callbacks are
replaced by the documented dense layouts (numpy views are cheap); its
external-threading variants have no TPU meaning (XLA owns parallelism).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import io as dio
from .config import SolverParams, make_rhs
from .utils import (default_complex_dtype, default_split,
                    device_get_complex, device_put_complex)
from .gauge import average_plaquette
from .geometry import Geometry
from .mg.hierarchy import LevelConfig, MGConfig, Multigrid
from .operators.oddeven import OddEvenPreconditioner
from .operators.wilson import WilsonOperator, d_plus_clover, d_dagger, shift_diagonal
from .smoothers import SchwarzPreconditioner
from . import cplx
from .solvers import bicgstab, cgn, fgmres, fgmres_mp


@dataclasses.dataclass
class SetupStatus:
    """Reference dd_alpha_amg_setup_status (dd_alpha_amg_setup_status.h)."""

    setup_time: float = 0.0
    iterations: int = 0
    gauge_updates_since_setup: int = 0


@dataclasses.dataclass
class SolveInfo:
    iterations: int
    relres: float
    converged: bool
    solve_time: float
    coarse_average: float = 0.0
    memory_mb: float = 0.0          # device-memory high water (main.h:88-140)
    inner_restart_cap: int = 0      # multi-RHS inner GCR length actually used
    # coarsest-level operator applications per outer iteration (matvec
    # equivalents): comparable with the reference's coarse-grid-iteration
    # average (72.55 on sample.ini, src/linsolve_generic.c:363-374) even
    # when coarsest_direct replaces the GCR with dense-inverse applies
    # (those are counted separately below)
    coarse_matvec_average: float = 0.0
    coarsest_inverse_applies: float = 0.0
    inner_tol_clip: float = 0.0     # f32 inner-sweep clip actually applied


_SCHEMES = {1: "additive", 2: "red_black", 3: "sixteen_color"}

# jitted operator applies: eager per-op dispatch is catastrophically slow on
# remote-compile TPU relays (every primitive becomes its own tiny program)
_jit_apply = jax.jit(lambda op, v: d_plus_clover(op, v))
_jit_dagger = jax.jit(lambda op, v: d_dagger(op, v))


class Solver:
    """Wilson-clover solver with the reference's method selection:
    method -1 CGN, 0 GMRES, 1/2/3 FGMRES + Schwarz (+AMG if interpolation>0
    and num_levels>1), 4 FGMRES + odd-even GMRES, 5 FGMRES + BiCGstab."""

    def __init__(self, params: SolverParams, mesh=None, mg_overrides=None):
        """mesh: optional 4D jax.sharding.Mesh (parallel.make_solver_mesh).
        With a mesh, the gauge field, fine/intermediate multigrid levels and
        all solve vectors are sharded by 4D domain decomposition; the
        coarsest level is replicated (reference process grid + gathering,
        src/ghost.c:47 / src/gathering_generic.c:44-209).
        mg_overrides: optional dict of MGConfig field overrides (e.g.
        {"min_local_sites": 0} to shard every level)."""
        self.p = params.validate()
        self.mesh = mesh
        self.mg_overrides = dict(mg_overrides or {})
        self.op: Optional[WilsonOperator] = None
        self.mg: Optional[Multigrid] = None
        self.preconditioner = None
        self.status = SetupStatus()
        self._U_host = None
        self._U_hopp_host = None
        self._wdf = None
        self._inner_dtype = (jnp.complex64 if params.mixed_precision
                             else default_complex_dtype())

    # --- configuration -------------------------------------------------

    @property
    def lattice(self):
        return tuple(self.p.depth[0].global_lattice)

    def read_conf(self, path: Optional[str] = None) -> float:
        path = path or self.p.configuration
        U, header_plaq = dio.read_gauge_field(path, anti_periodic=self.p.anti_pbc)
        plaq = self.set_conf(U, links_have_bc=True)
        return plaq, header_plaq

    def set_conf(self, U, links_have_bc: bool = False) -> float:
        """Store the gauge field and build the Dirac operator; returns the
        average plaquette (reference dd_alpha_amg_set_conf)."""
        # keep an exact complex128 host copy: the TPU outer loop computes
        # its true residual in double-float against the f64-accurate
        # operator (operators/dfloat.py) since TPU executes no f64 HLOs
        U_host = np.asarray(device_get_complex(U), np.complex128)
        bc = self.p.bc if self.p.bc is not None else (2 if self.p.anti_pbc else 1)
        if bc == 2 and not links_have_bc:
            U_host = U_host.copy()
            U_host[0, -1] *= -1.0
        U_hopp = U_host
        if bc == 0:
            # Dirichlet/open: clover from the full field, hopping time-links
            # zeroed at global t in {0, T-2, T-1}; a nonzero U_T on the last
            # slice is a caller layout error (reference
            # dd_alpha_amg_set_conf, src/dd_alpha_amg.c:195-237)
            if np.abs(U_host[0, -1]).max() != 0.0:
                raise ValueError(
                    "bc=0 (dirichlet): gauge field does not fit expected "
                    "boundary conditions (U_T on the last time slice must "
                    "be zero)")
            U_hopp = U_host.copy()
            U_hopp[0, 0] = 0.0
            U_hopp[0, -2] = 0.0
            U_hopp[0, -1] = 0.0
        self._U_host = U_host
        self._U_hopp_host = U_hopp
        self._wdf = None
        U = device_put_complex(U_host, dtype=default_complex_dtype())
        if self.mesh is not None:
            from . import parallel
            U = parallel.shard_links(self.mesh, U)
        if bc == 0:
            from .gauge import compute_clover
            U_h = device_put_complex(U_hopp, dtype=default_complex_dtype())
            if self.mesh is not None:
                from . import parallel
                U_h = parallel.shard_links(self.mesh, U_h)
            clov = compute_clover(U, self.p.m0, self.p.csw)
            self.op = WilsonOperator(links=0.5 * U_h, clover=clov)
        elif int(np.prod(self.lattice)) > 200_000:
            # large lattices: the one-program device clover materializes
            # O(100) staple temporaries and OOMs HBM (measured 70 GB at
            # 32^4); build it on the host instead (complex128, the same
            # routine the double-float outer operator uses) and ship the
            # finished blocks
            from .gauge import compute_clover_np
            clov = device_put_complex(
                compute_clover_np(U_host, self.p.m0, self.p.csw),
                dtype=default_complex_dtype())
            if self.mesh is not None:
                from . import parallel
                clov = parallel.shard_field(self.mesh, clov, self.lattice)
            self.op = WilsonOperator(links=0.5 * U, clover=clov)
        else:
            self.op = WilsonOperator.from_gauge(U, m0=self.p.m0, csw=self.p.csw)
        self.status.gauge_updates_since_setup += 1
        if int(np.prod(self.lattice)) > 200_000:
            # the one-program device plaquette holds ~50 GB of plane
            # temporaries at 32^4; the host U copy is already here
            from .tools import _plaquette
            return float(_plaquette(U_host))
        return float(average_plaquette(U))

    def _wilson_df(self):
        """The f64-accurate operator in double-float SoA form (cached per
        (m0, csw))."""
        from .gauge import compute_clover_np
        from .operators import dfloat as dfm
        key = (self.p.m0, self.p.csw)
        if self._wdf is not None and self._wdf[0] == key:
            return self._wdf[1], self._wdf[2]
        clov = compute_clover_np(self._U_host, self.p.m0, self.p.csw)
        wdf = dfm.build_wilson_df(0.5 * self._U_hopp_host, clov, self.lattice)
        roll = dfm.make_rollers_df(self.lattice)
        self._wdf = (key, wdf, roll)
        return wdf, roll

    # --- setup ---------------------------------------------------------

    def _mg_config(self) -> MGConfig:
        fine_layout = "auto"
        if self.mesh is not None and (self.mesh.shape["y"] > 1
                                      or self.mesh.shape["x"] > 1):
            # the SoA fast path fuses Y*X; meshes splitting y/x need the
            # shardable logical layout at depth 0
            fine_layout = "logical"
        if self.mg_overrides:
            import dataclasses as _dc
            return _dc.replace(self._mg_config_base(fine_layout),
                               **self.mg_overrides)
        return self._mg_config_base(fine_layout)

    def _mg_config_base(self, fine_layout) -> MGConfig:
        p = self.p
        return MGConfig(
            mesh=self.mesh, fine_layout=fine_layout,
            levels=[LevelConfig(
                lattice=tuple(d.global_lattice), block=tuple(d.block_lattice),
                post_smooth_iter=d.post_smooth_iter, block_iter=d.block_iter,
                num_test_vectors=d.test_vectors, setup_iter=d.setup_iter,
                n_cy=d.preconditioner_cycles,
            ) for d in p.depth[:p.num_levels]],
            kcycle=p.kcycle, kcycle_tol=p.kcycle_tol,
            kcycle_length=p.kcycle_length, kcycle_restarts=p.kcycle_restarts,
            coarse_tol=p.coarse_tol, coarse_iter=p.coarse_iter,
            coarse_restart=p.coarse_restart, odd_even=p.odd_even,
            scheme=_SCHEMES.get(p.method, "red_black"),
            dtype=self._inner_dtype, split=default_split(),
            seed=int(time.time()) if p.randomize_test_vectors else p.seed,
            coarse_block_bf16=(p.coarse_block_bf16
                               if p.coarse_block_bf16 is not None
                               else default_split()),
            coarsest_direct=(p.coarsest_direct
                             if p.coarsest_direct is not None
                             else default_split() and self._coarsest_n()
                             <= (16384 if self._coarsest_schur_ok() else 8192)),
            smoother_direct=(p.smoother_direct
                             if p.smoother_direct is not None
                             else default_split()
                             and jax.default_backend() == "tpu"),
        )

    def _coarsest_schur_ok(self) -> bool:
        """True when the coarsest level will get the Schur-complement (1/4
        storage) inverse -- must mirror the gate in
        Multigrid._maybe_build_dense_inv exactly, else the larger budget
        silently buys the FULL inverse at 4x the bytes."""
        p = self.p
        if not p.odd_even or p.num_levels < 2:
            return False
        return all(e % 2 == 0
                   for e in p.depth[p.num_levels - 1].global_lattice)

    def _coarsest_n(self) -> int:
        """Coarsest-problem size sites x 2 N_tv (dense-inverse feasibility:
        the stored inverse is 8 n^2 bytes full / 2 n^2 Schur, rebuilt at
        every setup iteration, so auto-enable only for small n)."""
        p = self.p
        if p.num_levels < 2:
            return 1 << 30
        sites = int(np.prod(p.depth[p.num_levels - 1].global_lattice))
        return sites * 2 * p.depth[p.num_levels - 2].test_vectors

    def setup(self) -> SetupStatus:
        """Build the preconditioner (reference dd_alpha_amg_setup =
        method_setup + method_update)."""
        assert self.op is not None, "call set_conf first"
        p = self.p
        t0 = time.time()
        d0 = p.depth[0]
        geom = Geometry(lattice=self.lattice, block=tuple(d0.block_lattice))

        if p.method in (1, 2, 3):
            if p.num_levels > 1 and p.interpolation > 0:
                if p.interpolation not in (1, 2, 4):
                    raise ValueError(
                        f"interpolation: {p.interpolation} unsupported "
                        "(0 off, 1 two-level extension, 2 bootstrap F-cycle, "
                        "4 read test vectors from file; src/setup_generic.c)")
                self.mg = Multigrid(self.op, self._mg_config())
                if p.interpolation == 4:
                    # read test vectors from checkpoint + re_setup
                    # (reference read_tv_from_file, src/setup_generic.c:131)
                    assert p.tv_io_file_name, "interpolation 4 needs tv file"
                    tvs = dio.read_test_vectors(
                        p.tv_io_file_name, self.lattice, n=d0.test_vectors,
                        single_file=p.tv_io_single_file)
                    self.mg.set_test_vectors(
                        tvs.reshape(d0.test_vectors, *self.lattice, 4, 3))
                elif p.interpolation == 2:
                    self.mg.bootstrap_setup()
                elif p.interpolation == 1:
                    # inv_iter_2lvl_extension_setup (src/setup_generic.c:324)
                    self.mg.twolevel_extension_setup()
                self.preconditioner = self.mg
            else:
                self.preconditioner = SchwarzPreconditioner(
                    self.op, geom, block_iter=d0.block_iter,
                    cycles=d0.preconditioner_cycles, odd_even=p.odd_even,
                    dtype=self._inner_dtype, scheme=_SCHEMES[p.method])
        elif p.method == 4:
            self.preconditioner = OddEvenPreconditioner(
                self.op, block_iter=d0.block_iter,
                cycles=d0.preconditioner_cycles, dtype=self._inner_dtype)
        elif p.method == 5:
            op64 = self.op.astype(self._inner_dtype)

            def bicg_prec(eta):
                res = bicgstab(lambda v: d_plus_clover(op64, v),
                               eta.astype(self._inner_dtype),
                               tol=1e-1, max_iter=50)
                return res.x
            self.preconditioner = bicg_prec
        else:
            self.preconditioner = None
        self.status.setup_time = time.time() - t0
        self.status.gauge_updates_since_setup = 0
        return self.status

    def update_setup(self, iterations: int = 1) -> SetupStatus:
        """Extra adaptive-setup iterations (reference
        dd_alpha_amg_setup_update), using the configured setup flavor."""
        assert self.mg is not None
        t0 = time.time()
        if self.p.interpolation == 1:
            self.mg.twolevel_extension_setup(iterations)
        else:
            self.mg.bootstrap_setup(iterations)
        self.status.setup_time += time.time() - t0
        return self.status

    # --- solves ----------------------------------------------------------

    def _single_reduce(self):
        """Arnoldi reduction policy for the host outer loop: under a
        device mesh every host<->device roundtrip rides the network, so
        each Arnoldi step runs as ONE fused device program
        (solvers/fgmres._orthogonalize_fused2 -- the TPU analog of the
        reference's SINGLE_ALLREDUCE_ARNOLDI, src/linsolve_generic.c:668,
        with the norm computed exactly so iteration counts are unchanged).
        Override with DDAAMG_SINGLE_REDUCE=0/1/fused/pythagoras."""
        env = os.environ.get("DDAAMG_SINGLE_REDUCE")
        if env is not None:
            return {"0": False, "1": "fused"}.get(env, env)
        return "fused" if self.mesh is not None else False

    def apply_operator(self, v):
        return _jit_apply(self.op, device_put_complex(v))

    def apply_preconditioner(self, v):
        """Reference dd_alpha_amg_preconditioner."""
        assert self.preconditioner is not None
        return self.preconditioner(device_put_complex(v))

    def _solve_mp_device(self, rhs, tol, x0=None):
        """fgmres_MP restructured for TPU (mixed_precision 2 with multigrid):
        each restart's f32 inner solve runs as ONE device program
        (Multigrid.inner_restart = flexible GCR + the traced MG cycle); the
        f64 true-residual refresh runs once per restart.  Host round-trips
        per solve: O(restarts), not O(iterations)."""
        import jax

        from .solvers.fgmres import FGMRESResult
        from .utils import host_array, host_float

        p = self.p
        x64 = bool(jax.config.read("jax_enable_x64"))
        hi = jnp.complex128 if x64 else jnp.complex64
        hi_r = jnp.float64 if x64 else jnp.float32
        lo_r = jnp.float32
        split = default_split()
        b = device_put_complex(np.asarray(rhs), dtype=hi, split=split)

        # outer f64 operator in the SoA fast layout (XLA path: f64 Pallas is
        # not supported by Mosaic; the layout win applies to emulated f64
        # the same as to f32)
        from .operators import fast
        op_hi = self.op.astype(hi)
        if not cplx.is_split(op_hi.links):
            op_hi = op_hi.split()
        links_hi = fast.links_to_soa(op_hi.links)
        clov_hi = fast.clover_to_soa(op_hi.clover)
        roll_hi = fast.make_rollers(self.lattice, rdtype=hi_r)
        lattice = self.lattice

        @jax.jit
        def residual_and_norm2(l, c, b, x):
            # the SoA ops are split-complex only; convert at the boundary
            # when the ambient representation is plain complex (CPU)
            xs = x if cplx.is_split(x) else cplx.as_carray(x)
            w = fast.spinor_from_soa(
                fast.d_plus_clover_soa(l, c, fast.spinor_to_soa(xs), roll_hi),
                lattice)
            if not cplx.is_split(b):
                w = jax.lax.complex(w.re, w.im)
            r = b - w
            return r, cplx.norm2(r)

        def cast_r(v, rd):
            return v.astype_real(rd) if cplx.is_split(v) else v.astype(
                jnp.complex128 if rd == jnp.float64 else jnp.complex64)

        norm_b = float(np.sqrt(host_float(cplx.norm2(b))))
        if x0 is not None:
            x = cast_r(device_put_complex(np.asarray(x0), dtype=hi,
                                          split=split), hi_r)
        else:
            x = cplx.zeros_like(b) if cplx.is_split(b) else jnp.zeros_like(b)
        iters = 0.0
        citers = np.zeros(3)   # [gcr_iters, coarsest matvecs, inv applies]
        resvec = []
        converged = False
        relres = 1.0
        for restart in range(p.max_restarts + 1):
            if restart == 0 and x0 is None:
                r, rn2 = b, cplx.norm2(b)
            else:
                # true residual in hi precision -- also runs once AFTER the
                # final inner restart so the returned relres/converged
                # reflect the solution actually returned
                r, rn2 = residual_and_norm2(links_hi, clov_hi, b, x)
            nr = float(np.sqrt(host_float(rn2)))
            relres = nr / norm_b
            resvec.append(relres)
            if relres < tol:
                converged = True
                break
            if restart == p.max_restarts:
                break
            # inner f32 restart must reduce ||r|| by the remaining factor
            # (clipped: f32 cannot verify much below ~1e-6 in one sweep)
            rel_target = max(tol * norm_b / nr, 1e-7)
            z, it, cit = self.mg.inner_restart(cast_r(r, lo_r), rel_target,
                                               m=p.restart_length)
            x = x + cast_r(z, hi_r)
            iters += host_float(it)
            citers += np.asarray(host_array(cit))
        if self.mg is not None:
            self.mg.stats["coarse_iterations"] = (
                self.mg.stats["coarse_iterations"] + citers[0])
            self.mg.stats["coarse_matvecs"] = (
                self.mg.stats["coarse_matvecs"] + citers[1])
            self.mg.stats["coarsest_inverse_applies"] = (
                self.mg.stats["coarsest_inverse_applies"] + citers[2])
        return FGMRESResult(x, int(iters), relres, converged, resvec)

    def _solve_df_device(self, rhs, tol, x0=None):
        """TPU production outer loop: the reference's f64 outer fgmres_MP
        (src/linsolve.c:153-314) rebuilt without f64 HLOs.

        Each restart: ONE device program for the f32 inner solve
        (Multigrid.inner_restart = flexible GCR over the traced MG cycle),
        then a true-residual refresh in DOUBLE-FLOAT (two-f32, ~49-bit)
        arithmetic against the f64-accurate operator (operators/dfloat.py)
        -- so relative residuals down to 1e-10 and beyond are reached and
        *verified* on a chip with no f64 support.  Host round-trips per
        solve: O(restarts), not O(iterations) (the reference's host is its
        compute device, linsolve_generic.c:219; on TPU a host-driven Arnoldi
        pays ~26 ms/iteration in dispatch).

        Implemented as the B=1 case of _solve_df_multi so the outer-loop
        logic exists exactly once."""
        from .solvers.fgmres import FGMRESResult

        x_log, its, relres, converged, resvec = self._solve_df_multi(
            np.asarray(rhs)[None], tol,
            x0=None if x0 is None else np.asarray(x0)[None])
        return FGMRESResult(x_log[0], int(its[0]), float(relres[0]),
                            bool(converged[0]), [float(r[0]) for r in resvec])

    def _solve_df_plain(self, rhs, tol, prec=None, x0=None):
        """Double-float outer refinement for the NON-multigrid Krylov
        methods on TPU (0 GMRES, 1/2/3 FGMRES+Schwarz without AMG).

        The host FGMRES's 'f64' outer silently demotes to f32 where x64
        is unavailable: on the 4^4 method-1 problem 79 f32 Arnoldi
        iterations reported 8.3e-11 from the Givens recurrence while the
        TRUE residual sat at 9.4e-4 (measured on the chip).  Here every
        restart re-anchors on the double-float residual against the
        f64-accurate host-built operator (operators/dfloat.py) -- the
        same standard as the MG production path -- and the f32 inner is
        a device-restart flexible GCR with the method's (traceable)
        preconditioner.  Methods 4/5 keep the host loop: their inner
        solvers (host-Givens GMRES / BiCGstab) are host-driven and
        cannot sit inside the traced GCR body.  Reference analog:
        fgmres_MP's double outer recurrences + restart anchors
        (src/linsolve.c:153-314)."""
        import jax

        from .operators import dfloat as dfm
        from .solvers.device_gmres import device_gcr
        from .solvers.fgmres import FGMRESResult
        from .utils import host_array, host_float

        p = self.p
        lat = self.lattice
        t, z, y, x_ = lat
        wdf, _ = self._wilson_df()
        residual, extract_r32, axpy = dfm.build_outer_fns(lat)

        def to_soa64(a64):
            return np.transpose(a64.reshape(*lat, 4, 3),
                                (4, 5, 0, 1, 2, 3)).reshape(4, 3, t, z, y * x_)

        b64 = np.asarray(rhs, np.complex128).reshape(*lat, 4, 3)
        b_cdf = dfm.cdf_from64(to_soa64(b64))
        norm_b = float(np.linalg.norm(b64)) or 1.0
        if x0 is not None:
            x = dfm.cdf_from64(to_soa64(
                np.asarray(x0, np.complex128).reshape(*lat, 4, 3)))
        else:
            zero = jnp.zeros((4, 3, t, z, y * x_), jnp.float32)
            x = dfm.CDF(dfm.DF(zero, zero), dfm.DF(zero, zero))

        m = max(5, int(p.restart_length))
        op = self.op
        clip = 1e-5 if p.inner_tol_clip is None else float(p.inner_tol_clip)
        nb32 = jnp.float32(norm_b)
        tol32 = jnp.float32(tol)
        clip32 = jnp.float32(clip)

        if getattr(self, "_df_plain_step", None) is None \
                or self._df_plain_step[0] != (lat, id(prec)):
            def step(wdf_, b_, x_c):
                r, rn2 = residual(wdf_, b_, x_c)
                nr = jnp.sqrt(jnp.maximum(rn2[0] + rn2[1], 0.0))
                rel = nr / nb32
                target = jnp.where(
                    rel < tol32, jnp.float32(2.0),
                    jnp.maximum(tol32 * nb32 / jnp.maximum(nr, 1e-30),
                                clip32))
                rb = extract_r32(r)          # logical f32 CArray
                z1, it, _, _ = device_gcr(
                    lambda v: _jit_apply(op, v), rb, m=m, tol=target,
                    n_restarts=1, prec=prec)
                return axpy(x_c, z1), rel, it
            self._df_plain_step = ((lat, id(prec)), jax.jit(step))
        step_j = self._df_plain_step[1]

        resvec: list[float] = []
        total_it = 0.0
        relres = 1.0
        converged = False
        for _restart in range(p.max_restarts):
            x, rel, it = step_j(wdf, b_cdf, x)
            relres = float(host_float(rel))
            total_it += float(host_float(it))
            resvec.append(relres)
            if relres < tol:
                converged = True
                break
        # final VERIFIED residual of the returned solution
        _, rn2 = residual(wdf, b_cdf, x)
        arr = host_array(rn2)
        nr = float(np.sqrt(max(float(arr[0]) + float(arr[1]), 0.0)))
        relres = nr / norm_b
        resvec.append(relres)
        converged = relres < tol
        self._last_inner_clip = clip
        self._last_m_cap = m
        # SoA64 -> logical complex128 host array
        x64 = dfm.cdf_to64(x).reshape(4, 3, *lat)
        x_log = np.transpose(x64, (2, 3, 4, 5, 0, 1))
        return FGMRESResult(x_log, int(total_it), relres, converged, resvec)

    def _solve_df_multi(self, rhs_batch, tol, x0=None):
        """Batched multi-RHS production outer loop: _solve_df_device with
        every per-restart device program vmapped over the B right-hand
        sides (Multigrid.inner_restart_batch).  One propagator = 12 RHS;
        batching feeds the MXU (B, 2N, 2N) coarse matmuls and pays the
        ~26 ms relay dispatch once per restart for the WHOLE batch.  No
        reference analog (SURVEY 2.14.8: multiple-RHS absent upstream)."""
        import jax

        from .operators import dfloat as dfm
        from .utils import host_array

        p = self.p
        lat = self.lattice
        t, z, y, x_ = lat
        wdf, _ = self._wilson_df()

        def to_soa64(a64):
            return np.transpose(a64.reshape(-1, *lat, 4, 3),
                                (0, 5, 6, 1, 2, 3, 4)).reshape(
                                    -1, 4, 3, t, z, y * x_)

        b64 = np.asarray(rhs_batch, np.complex128).reshape(-1, *lat, 4, 3)
        B = b64.shape[0]
        b_cdf = dfm.cdf_from64(to_soa64(b64))
        norm_b = np.linalg.norm(b64.reshape(B, -1), axis=1)
        norm_b = np.where(norm_b == 0, 1.0, norm_b)

        # batched views of the cached outer building blocks; the jit
        # wrappers are cached on self so repeated solves never recompile
        # cache key includes the hierarchy identity: the fused step bakes
        # the mg config's trace-time constants (kcycle/coarse tolerances)
        if getattr(self, "_df_multi_fns", None) is None \
                or self._df_multi_fns[0] != (lat, id(self.mg)):
            residual, extract_r32, axpy = dfm.build_outer_fns(lat)
            big_lat = int(np.prod(lat)) > 200_000
            if big_lat:
                # build_outer_fns' large-lattice residual is a CHAIN of
                # jitted programs (clover + one per hop direction) so its
                # df temporaries fit the free HBM; wrapping it in one
                # jit+vmap would re-fuse it -- batch by python lane loop
                # (B is 1 on the memory-tight path anyway)
                def residual_b_big(w, bb, xx):
                    outs = [residual(
                        w,
                        jax.tree_util.tree_map(lambda a: a[i], bb),
                        jax.tree_util.tree_map(lambda a: a[i], xx))
                        for i in range(bb.re.hi.shape[0])]
                    rs = jax.tree_util.tree_map(
                        lambda *a: jnp.stack(a), *[o[0] for o in outs])
                    return rs, jnp.stack([o[1] for o in outs])

            # ONE device program per outer restart: df true residual ->
            # per-lane relative residual and inner target -> inner GCR
            # (frozen for converged lanes) -> df solution update.  The
            # host's only per-restart work is ONE dispatch + ONE scalar
            # fetch of rel; r3's loop paid ~5 dispatches/restart (~26 ms
            # each on the relay) for the same math.
            def _step(data, wdf_, b_, x_, nb_, tol32, clip32, m):
                def one(b1, x1, nb1):
                    r, rn2 = residual(wdf_, b1, x1)
                    nr = jnp.sqrt(jnp.maximum(rn2[0] + rn2[1], 0.0))
                    rel = nr / nb1
                    conv = rel < tol32
                    target = jnp.where(
                        conv, jnp.float32(2.0),
                        jnp.maximum(tol32 * nb1 / jnp.maximum(nr, 1e-30),
                                    clip32))
                    z, it, cit = self.mg._inner_restart_impl(
                        data, extract_r32(r), target, m)
                    return axpy(x1, z), rel, it, cit
                return jax.vmap(one)(b_, x_, nb_)

            self._df_multi_fns = (
                (lat, id(self.mg)),
                residual_b_big if big_lat else
                jax.jit(jax.vmap(residual, in_axes=(None, 0, 0))),
                jax.jit(jax.vmap(extract_r32)),
                jax.jit(jax.vmap(axpy)),
                jax.jit(_step, static_argnames=("m",)))
        _, residual_b, extract_b, axpy_b, step_b = self._df_multi_fns

        if x0 is not None:
            x = dfm.cdf_from64(to_soa64(np.asarray(x0, np.complex128)))
        else:
            zero = jnp.zeros((B, 4, 3, t, z, y * x_), jnp.float32)
            x = dfm.CDF(dfm.DF(zero, zero), dfm.DF(zero, zero))

        # device-resident GCR basis memory scales with B x restart length:
        # cap the inner restart length so the two GCR bases stay within
        # DDAAMG_INNER_BASIS_BUDGET complex elements (default 150M = ~2.4 GB
        # of split-f32 basis on a 16 GB chip).  Too small a cap silently
        # forces extra double-float refreshes per solve -- the cap actually
        # applied is surfaced in SolveInfo.inner_restart_cap / bench output.
        n_dof = int(np.prod(lat)) * 12
        budget = int(os.environ.get("DDAAMG_INNER_BASIS_BUDGET", 150_000_000))
        m_cap = int(os.environ.get(
            "DDAAMG_INNER_M_CAP",
            max(5, min(p.restart_length, budget // max(n_dof * B, 1)))))
        self._last_m_cap = m_cap

        # Inner-sweep tolerance clip: how much true (double-float) residual
        # reduction one f32 inner sweep is asked to deliver before the df
        # outer refreshes.  The r4 claim that this was floored at 2e-3 by
        # "f32 operator rounding" was a misattribution: the floor was the
        # TPU's DEFAULT one-bf16-pass matmul precision inside the inner
        # GCR's orthogonalization einsums (see docs/iteration_parity.md);
        # with true-f32 Krylov recurrences (solvers/device_gmres.py) a
        # sweep verifies down to ~kappa(D)*eps_f32.  The reference's inner
        # f32 restart threshold is MAX(tol, 1e-5) (src/linsolve.c:44) --
        # the same depth used here, so the sweep structure (2 sweeps to
        # 1e-10 + short tail) matches the reference's restart structure.
        # Converged lanes get tol 2.0 -> the vmapped early-exit GCR
        # freezes them at iteration 0 with a zero correction.
        #
        # p.inner_tol_clip None = ADAPTIVE (condition-aware): start at the
        # reference depth 1e-5 and, whenever a sweep falls well short of
        # its requested reduction, raise the clip to ~0.7x the measured
        # per-sweep floor of THIS problem (an ill-conditioned operator
        # exposes its own kappa*eps floor; a fixed deep clip would waste
        # iterations there).  DDAAMG_INNER_CLIP overrides with a fixed
        # value.
        env_clip = os.environ.get("DDAAMG_INNER_CLIP")
        fixed_clip = (float(env_clip) if env_clip is not None
                      else p.inner_tol_clip)
        adaptive_clip = fixed_clip is None
        clip = 1e-5 if adaptive_clip else float(fixed_clip)
        # the fused step bakes the Pallas-vs-einsum stencil choice per
        # batch size (B>1: einsum views, see Multigrid._level_data_batched)
        data = (self.mg._level_data() if B == 1
                else self.mg._level_data_batched())
        nb_dev = jnp.asarray(norm_b, jnp.float32)
        tol32 = jnp.float32(tol)
        clip32 = jnp.float32(clip)

        # huge volumes: run the phases as SEPARATE dispatches -- the fused
        # step's combined workspace (df residual temps + inner GCR bases +
        # cycle) does not fit next to the 32^4 hierarchy's ~8 GB resident
        # set; the extra ~4 dispatches/restart are noise at this scale
        fused = n_dof <= 200_000 * 12

        def adapt_clip(clip, prev_rel, cur_rel):
            """Condition-aware clip update from the measured reduction of
            the restart that just ran: lanes whose sweep fell well short of
            its requested target expose the f32 per-sweep floor."""
            with np.errstate(divide="ignore", invalid="ignore"):
                ach = cur_rel / np.maximum(prev_rel, 1e-300)
            req = np.maximum(tol / np.maximum(prev_rel, 1e-300), clip)
            learn = (prev_rel >= tol) & (ach > 3.0 * req) & (ach < 1.0)
            if learn.any():
                return float(min(max(clip, 0.7 * ach[learn].max()), 5e-2))
            return clip

        it_handles = []
        resvec = []
        relres = np.ones(B)
        prev_rel = None
        converged = np.zeros(B, bool)
        for restart in range(p.max_restarts):
            if fused:
                # ONE dispatch: df residual + per-lane targets + inner GCR
                # + df update; ONE fetch: the pre-step relative residuals
                x, rel, it, cit = step_b(data, wdf, b_cdf, x, nb_dev,
                                         tol32, clip32, m=m_cap)
                it_handles.append((it, cit))
                relres = np.asarray(host_array(rel), np.float64)
                if adaptive_clip and prev_rel is not None:
                    clip = adapt_clip(clip, prev_rel, relres)
                    clip32 = jnp.float32(clip)   # traced arg: no recompile
                prev_rel = relres.copy()
            else:
                r_cdf, rn2 = residual_b(wdf, b_cdf, x)
                arr = np.asarray(host_array(rn2))
                nr = np.sqrt(np.maximum(arr[:, 0] + arr[:, 1], 0.0))
                relres = nr / norm_b
                if adaptive_clip and prev_rel is not None:
                    clip = adapt_clip(clip, prev_rel, relres)
                prev_rel = relres.copy()
                if (relres < tol).all():
                    resvec.append(relres.copy())
                    converged = relres < tol
                    break
                rel_target = np.where(
                    relres < tol, 2.0,
                    np.maximum(tol * norm_b / np.maximum(nr, 1e-300), clip))
                rb = extract_b(r_cdf)
                del r_cdf
                if B == 1:
                    # Pallas cycle views (slim_for_solve may have dropped
                    # the batched einsum views' clover arrays)
                    z1, it, cit = self.mg.inner_restart(
                        rb[0], float(rel_target[0]), m=m_cap)
                    zc = jax.tree_util.tree_map(lambda a: a[None], z1)
                else:
                    zc, it, cit = self.mg.inner_restart_batch(
                        rb, rel_target, m=m_cap)
                x = axpy_b(x, zc)
                it_handles.append((it, cit))
            resvec.append(relres.copy())
            converged = relres < tol
            if converged.all():
                break
        # final VERIFIED residual of the returned solution (the loop's rel
        # is the pre-step residual; the last step's correction is unchecked)
        _, rn2 = residual_b(wdf, b_cdf, x)
        arr = np.asarray(host_array(rn2))               # [B, 2] (hi, lo)
        nr = np.sqrt(np.maximum(arr[:, 0] + arr[:, 1], 0.0))
        relres = nr / norm_b
        resvec.append(relres.copy())
        converged = relres < tol
        self._last_inner_clip = clip   # observability (bench / SolveInfo)
        its = np.zeros(B)
        cits = np.zeros((B, 3))
        for it, cit in it_handles:
            its += np.asarray(host_array(it))
            cits += np.asarray(host_array(cit)).reshape(-1, 3)
        if self.mg is not None:
            self.mg.stats["coarse_iterations"] = (
                self.mg.stats["coarse_iterations"] + float(cits[:, 0].sum()))
            self.mg.stats["coarse_matvecs"] = (
                self.mg.stats["coarse_matvecs"] + float(cits[:, 1].sum()))
            self.mg.stats["coarsest_inverse_applies"] = (
                self.mg.stats["coarsest_inverse_applies"]
                + float(cits[:, 2].sum()))
        x_log = dfm.cdf_to64(x).reshape(B, 4, 3, t, z, y, x_).transpose(
            0, 3, 4, 5, 6, 1, 2)
        return x_log, its, relres, converged, resvec

    def solve_multi(self, rhs_batch, tol: Optional[float] = None
                    ) -> tuple[np.ndarray, list]:
        """Solve D x_i = rhs_i for a stack of right-hand sides
        [B, T,Z,Y,X,4,3] with one setup.  On the TPU production path all B
        systems advance together inside each device program (vmapped
        double-float restarts); otherwise the systems are solved
        sequentially against the shared preconditioner.  Returns
        (x [B,...], [SolveInfo] * B)."""
        assert self.op is not None
        p = self.p
        tol = tol if tol is not None else p.tol
        rhs_batch = np.asarray(rhs_batch)
        B = rhs_batch.shape[0]

        if (self.mg is not None and self._U_host is not None
                and default_split()
                and not os.environ.get("DDAAMG_HOST_OUTER")):
            self.mg.stats["coarse_iterations"] = 0
            self.mg.stats["coarse_solves"] = 0
            self.mg.stats["coarse_matvecs"] = 0
            self.mg.stats["coarsest_inverse_applies"] = 0
            t0 = time.time()
            x_log, its, relres, converged, _ = self._solve_df_multi(
                rhs_batch, tol)
            dt = time.time() - t0
            from .profiling import solve_memory_mb
            mem = solve_memory_mb(self)
            cavg = float(self.mg.stats["coarse_iterations"]) / max(
                float(its.sum()), 1.0)
            mavg = float(self.mg.stats["coarse_matvecs"]) / max(
                float(its.sum()), 1.0)
            inv_tot = float(self.mg.stats["coarsest_inverse_applies"])
            infos = [SolveInfo(iterations=int(its[i]), relres=float(relres[i]),
                               converged=bool(converged[i]), solve_time=dt / B,
                               memory_mb=mem,
                               coarse_average=cavg,
                               coarse_matvec_average=mavg,
                               coarsest_inverse_applies=inv_tot / B,
                               inner_restart_cap=getattr(self, "_last_m_cap", 0))
                     for i in range(B)]
            return x_log, infos

        xs, infos = [], []
        for i in range(B):
            xi, info = self.solve(rhs_batch[i], tol=tol)
            xs.append(np.asarray(xi))
            infos.append(info)
        return np.stack(xs), infos

    def true_residual(self, x, rhs) -> float:
        """||rhs - D x|| / ||rhs|| against the f64-accurate operator (the
        reference's FGMRES_RESTEST, src/linsolve_generic.c:351-356).  On
        TPU the f32 operator apply floors this check at ~cond * 1e-7, so
        the double-float operator is used instead."""
        from .utils import host_array
        b64 = np.asarray(rhs, np.complex128)
        x64 = np.asarray(x, np.complex128)
        if self._U_host is not None and default_split():
            from .operators import dfloat as dfm
            lat = self.lattice
            t, z, y, x_ = lat
            wdf, _ = self._wilson_df()
            residual, _, _ = dfm.build_outer_fns(lat)

            def to_soa64(a):
                return np.transpose(a.reshape(*lat, 4, 3),
                                    (4, 5, 0, 1, 2, 3)).reshape(4, 3, t, z, y * x_)

            _, rn2 = residual(wdf, dfm.cdf_from64(to_soa64(b64)),
                              dfm.cdf_from64(to_soa64(x64)))
            hi, lo = host_array(rn2)
            nr = float(np.sqrt(max(float(hi) + float(lo), 0.0)))
            return nr / np.linalg.norm(b64)
        r = b64 - device_get_complex(self.apply_operator(x64))
        return float(np.linalg.norm(r) / np.linalg.norm(b64))

    def slim_for_solve(self):
        """HBM-tight very large problems (32^4 on one 16 GB chip): release
        everything not needed for df-path SOLVES -- the multigrid's
        setup-only arrays (Multigrid.slim_for_solve) and the logical fine
        operator (the df outer loop uses the double-float operator built
        from the host copy).  setup()/set_conf() restore full function."""
        if self.mg is not None:
            self.mg.slim_for_solve()
        self.op = None

    def solve(self, rhs=None, tol: Optional[float] = None,
              x0=None) -> tuple[np.ndarray, SolveInfo]:
        """Solve D x = rhs (reference dd_alpha_amg_wilson_solve /
        solve_driver)."""
        assert self.op is not None or (
            self.mg is not None and self._U_host is not None), \
            "call set_conf first"
        p = self.p
        tol = tol if tol is not None else p.tol
        if rhs is None:
            rhs = make_rhs(p.right_hand_side, self.lattice, seed=p.seed)
        use_df = (self.mg is not None and self._U_host is not None
                  and default_split()
                  and not os.environ.get("DDAAMG_HOST_OUTER"))
        # non-MG Krylov methods whose preconditioner is traceable get the
        # same double-float outer treatment (see _solve_df_plain)
        use_df_plain = (not use_df and self.mg is None and self.mesh is None
                        and p.method in (0, 1, 2, 3)
                        and self._U_host is not None and default_split()
                        and not os.environ.get("DDAAMG_HOST_OUTER"))
        b = None
        if p.method == -1 or not (use_df or use_df_plain):
            # the df production path builds its own double-float device rhs
            # from the numpy array; this logical-layout copy would be dead
            # weight (0.8 GB at 32^4)
            b = device_put_complex(rhs, dtype=default_complex_dtype())
            if self.mesh is not None:
                from . import parallel
                b = parallel.shard_field(self.mesh, b, self.lattice)

        if self.mg is not None:
            self.mg.stats["coarse_iterations"] = 0
            self.mg.stats["coarse_solves"] = 0
            self.mg.stats["coarse_matvecs"] = 0
            self.mg.stats["coarsest_inverse_applies"] = 0

        # profiling hooks (reference PROF_PRECISION_START/STOP around the
        # fine operator and the preconditioner)
        from .profiling import FLOPS_FINE_FULL, PROF
        vol = int(np.prod(self.lattice))

        def prof_op(fn, name, flops):
            def wrapped(v):
                t0 = time.perf_counter()
                out = fn(v)
                if PROF.sync:
                    import jax
                    jax.block_until_ready(out.re if hasattr(out, "re") else out)
                PROF.add(name, 0, time.perf_counter() - t0, flops)
                return out
            return wrapped if PROF.enabled else fn

        apply_fine = prof_op(lambda v: _jit_apply(self.op, v),
                             "fine_op (d_plus_clover)", FLOPS_FINE_FULL * vol)
        prec = self.preconditioner
        if prec is not None:
            prec = prof_op(prec, "preconditioner (v-cycle)", 0.0)

        t0 = time.time()
        if p.method == -1:
            res = cgn(apply_fine,
                      lambda v: _jit_dagger(self.op, v), b, x0=x0, tol=tol,
                      max_iter=p.restart_length * p.max_restarts)
        elif (self.mg is not None and self._U_host is not None
              and default_split()
              and not os.environ.get("DDAAMG_HOST_OUTER")):
            # TPU production path (any mixed_precision): device-restart
            # inner solves + double-float outer residual -- O(restarts)
            # host round-trips and true 1e-10 verification without f64
            res = self._solve_df_device(rhs, tol, x0=x0)
        elif use_df_plain:
            res = self._solve_df_plain(rhs, tol, prec=self.preconditioner,
                                       x0=x0)
        elif p.mixed_precision == 2 and self.mg is not None:
            # restart-shaped fgmres_MP: whole inner restarts as single
            # device programs, O(restarts) host round-trips
            res = self._solve_mp_device(rhs, tol, x0=x0)
        elif p.mixed_precision == 2:
            # fgmres_MP (src/linsolve.c:153): f64 outer / f32 inner; the
            # operator is applied in whatever precision the vector carries
            ops = {}

            def apply_mp(v):
                rd = v.rdtype if cplx.is_split(v) else \
                    np.zeros((), np.dtype(v.dtype)).real.dtype
                if rd not in ops:
                    cd = jnp.complex128 if rd == jnp.float64 else jnp.complex64
                    ops[rd] = self.op.astype(cd)
                return _jit_apply(ops[rd], v)

            res = fgmres_mp(prof_op(apply_mp, "fine_op (d_plus_clover)",
                                    FLOPS_FINE_FULL * vol), b, x0=x0,
                            preconditioner=prec, tol=tol,
                            restart_length=p.restart_length,
                            max_restarts=p.max_restarts,
                            single_reduce=self._single_reduce())
        else:
            res = fgmres(apply_fine, b, x0=x0,
                         preconditioner=prec, tol=tol,
                         restart_length=p.restart_length,
                         max_restarts=p.max_restarts,
                         single_reduce=self._single_reduce())
        dt = time.time() - t0
        coarse_avg = 0.0
        matvec_avg = 0.0
        inv_applies = 0.0
        if self.mg is not None and res.iterations:
            coarse_avg = float(
                self.mg.stats["coarse_iterations"]) / res.iterations
            matvec_avg = float(
                self.mg.stats["coarse_matvecs"]) / res.iterations
            inv_applies = float(self.mg.stats["coarsest_inverse_applies"])
        from .profiling import solve_memory_mb
        info = SolveInfo(iterations=res.iterations, relres=res.relres,
                         converged=res.converged, solve_time=dt,
                         coarse_average=coarse_avg,
                         coarse_matvec_average=matvec_avg,
                         coarsest_inverse_applies=inv_applies,
                         inner_tol_clip=getattr(self, "_last_inner_clip", 0.0),
                         inner_restart_cap=getattr(self, "_last_m_cap", 0),
                         memory_mb=solve_memory_mb(self))
        return device_get_complex(res.x), info

    def write_test_vectors(self, path: Optional[str] = None,
                           single_file: Optional[bool] = None):
        """Checkpoint the adaptive setup's test vectors (reference
        vector_io_single_file WRITE mode, src/io.c:951); reload in a later
        run with `interpolation: 4`."""
        assert self.mg is not None, "no multigrid setup to checkpoint"
        path = path or self.p.tv_io_file_name
        single = self.p.tv_io_single_file if single_file is None else single_file
        tvs = self.mg.get_test_vectors()
        dio.write_test_vectors(path, tvs.reshape(tvs.shape[0], *self.lattice, 12),
                               single_file=single,
                               header={"m0": self.p.m0, "csw": self.p.csw})

    def shift_update(self, new_m0: float):
        """Change the mass parameter and re-propagate through the hierarchy
        WITHOUT a new setup (reference shift_update,
        src/dirac_generic.c:504-551 via dd_alpha_amg_set_mass_for_next_solve):
        the multigrid levels get +delta * I on their self-couplings with
        factored inverses recomputed -- O(1) device work.  Non-multigrid
        preconditioners are simply rebuilt (they carry no adaptive state)."""
        delta = new_m0 - self.p.m0
        if delta == 0.0:
            return
        self.p.m0 = new_m0
        self.op = shift_diagonal(self.op, delta)
        if self.mg is not None:
            self.mg.shift_update(delta)
        elif self.preconditioner is not None:
            self.setup()
