"""Built-in runtime diagnostics, mirroring the reference's DEBUG-build
self-checks and analysis flags:

  * run_self_checks  -- the reference `test_routine` (src/solver_analysis.c:25-53):
    P^H P = I, Galerkin consistency P^H D P = D_c, coarse gamma5-Hermiticity,
    odd-even Schur identity, fine-layout (SoA vs logical) operator equality.
    Each check returns a residual that should be ~machine epsilon.
  * test_vector_analysis -- TESTVECTOR_ANALYSIS (src/setup_generic.c:506-529):
    eigenvector quality of the test vectors (Rayleigh-quotient residuals).
  * smoother_reduction -- SCHWARZ_RES (doc/user_doc.tex:100-102): residual
    reduction factor of one SAP application.
  * coarse_reduction -- COARSE_RES: relative residual achieved by the
    coarsest solve.

All functions return plain floats (device work happens inside, one fetch
per number).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import cplx
from .mg.interpolation import interpolate, restrict
from .operators.coarse import coarse_apply, coarse_gamma5
from .utils import device_put_complex, host_float


def _rnorm(a) -> float:
    return float(np.sqrt(host_float(cplx.norm2(a))))


def run_self_checks(mg, seed: int = 0) -> dict:
    """Hierarchy invariants on random vectors; keys -> residuals
    (reference coarse_operator test_routine,
    src/coarse_operator_generic.c:417-559)."""
    rng = np.random.default_rng(seed)
    out = {}
    lvl = mg.fine
    while lvl is not None and not lvl.is_coarsest:
        nxt = lvl.next
        d = lvl.depth
        ns = nxt.stencil
        cshape = (*nxt.geom.lattice, int(np.prod(nxt.dof_shape)))
        vc = device_put_complex(
            (rng.normal(size=cshape) + 1j * rng.normal(size=cshape)),
            dtype=mg.cfg.dtype, split=mg._split)

        def coarse_apply_logical(w):
            # next-level operator on logical-layout fields (identity hooks
            # for the logical coarse layout)
            return ns.to_logical(ns.full_op(ns.from_logical(w)))

        # P^H P = I
        vc2 = restrict(lvl.agg, lvl.P, interpolate(lvl.agg, lvl.P, vc,
                                                   lvl.dof_shape))
        out[f"depth{d}: P^H P == I"] = _rnorm(vc2 - vc) / _rnorm(vc)

        # Galerkin: D_c v == P^H D P v
        lhs = coarse_apply_logical(vc)
        fine_v = lvl.stencil.from_logical(
            interpolate(lvl.agg, lvl.P, vc, lvl.dof_shape))
        rhs = restrict(lvl.agg, lvl.P,
                       lvl.stencil.to_logical(lvl.stencil.full_op(fine_v)))
        out[f"depth{d}: P^H D P == D_c"] = _rnorm(lhs - rhs) / _rnorm(lhs)

        # coarse gamma5-Hermiticity: <y, g5 D x> == <g5 D y, x>
        yc = device_put_complex(
            (rng.normal(size=cshape) + 1j * rng.normal(size=cshape)),
            dtype=mg.cfg.dtype, split=mg._split)
        a = cplx.vdot(yc, coarse_gamma5(coarse_apply_logical(vc)))
        b = cplx.vdot(coarse_gamma5(coarse_apply_logical(yc)), vc)
        num = abs(complex(host_float(cplx.real(a - b)),
                          host_float(cplx.imag(a - b))))
        den = abs(complex(host_float(cplx.real(a)), host_float(cplx.imag(a))))
        out[f"depth{d+1}: g5_c D_c Hermiticity"] = num / max(den, 1e-30)
        lvl = nxt
    return out


def test_vector_analysis(mg) -> list:
    """Per test vector: (rayleigh quotient rho, ||D v - rho v|| / ||v||)
    at depth 0 (reference TESTVECTOR_ANALYSIS)."""
    lvl = mg.fine
    s = lvl.stencil
    rows = []
    for i in range(lvl.test_vectors.shape[0]):
        v = lvl.test_vectors[i]
        dv = s.full_op(v)
        num = cplx.vdot(v, dv)
        n2 = host_float(cplx.norm2(v))
        rho = complex(host_float(cplx.real(num)), host_float(cplx.imag(num))) / n2
        if cplx.is_split(v):
            rv = cplx.CArray(float(rho.real) * v.re - float(rho.imag) * v.im,
                             float(rho.real) * v.im + float(rho.imag) * v.re)
        else:
            rv = rho * v
        res = float(np.sqrt(host_float(cplx.norm2(dv - rv)) / n2))
        rows.append((rho, res))
    return rows


def smoother_reduction(solver, seed: int = 0) -> float:
    """||eta - D M_SAP(eta)|| / ||eta|| for one smoother application
    (SCHWARZ_RES analog)."""
    from .utils import device_get_complex
    rng = np.random.default_rng(seed)
    shape = (*solver.lattice, 4, 3)
    eta_np = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    eta = device_put_complex(eta_np)
    z = solver.apply_preconditioner(eta)
    # device->host crossings must be complex-transfer-safe on TPU
    dz = device_get_complex(solver.apply_operator(
        device_put_complex(device_get_complex(z))))
    r = device_put_complex(eta_np - dz)
    return _rnorm(r) / _rnorm(eta)


def coarse_reduction(mg, seed: int = 0) -> float:
    """Relative residual of one coarsest-level solve (COARSE_RES analog)."""
    lvl = mg.fine
    while not lvl.next.is_coarsest:
        lvl = lvl.next
    nxt = lvl.next
    rng = np.random.default_rng(seed)
    cshape = nxt.stencil.field_shape     # the level's stencil layout
    b = device_put_complex(rng.normal(size=cshape) + 1j * rng.normal(size=cshape),
                           dtype=mg.cfg.dtype, split=mg._split)
    x, _ = mg._coarsest_solve_traced(nxt.stencil, nxt.geom, b, mg.cfg.coarse_tol)
    return _rnorm(b - nxt.stencil.full_op(x)) / _rnorm(b)
