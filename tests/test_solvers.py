"""Krylov solver correctness: plain FGMRES / CGN / BiCGstab solves of the
Wilson-clover system on the bundled 4^4 config to 1e-10 relative residual.
This is BASELINE config 1 ("plain FGMRES on 4^4, single device")."""

import numpy as np
import pytest

from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu.operators import wilson
from ddalphaamg_tpu.solvers import fgmres, cgn, bicgstab, fgcr

M0, CSW = -0.5, 1.0


@pytest.fixture(scope="module")
def op4(conf4):
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    return wilson.WilsonOperator.from_gauge(U, m0=M0, csw=CSW)


@pytest.fixture(scope="module")
def rhs_ones(op4):
    # reference default rhs: all ones (sample.ini "right hand side: 0")
    return np.ones((*op4.lattice, 4, 3), dtype=complex)


def true_relres(op, x, b):
    from ddalphaamg_tpu.operators.wilson import d_plus_clover

    r = np.asarray(b) - np.asarray(d_plus_clover(op, x))
    return np.linalg.norm(r) / np.linalg.norm(b)


def test_fgmres_plain_4to4(op4, rhs_ones):
    import jax.numpy as jnp

    b = jnp.asarray(rhs_ones)
    res = fgmres(lambda v: wilson.d_plus_clover(op4, v), b,
                 tol=1e-10, restart_length=50, max_restarts=20)
    assert res.converged, res.relres
    assert true_relres(op4, res.x, b) < 1e-9
    assert res.iterations < 1000


def test_fgmres_single_reduce_parity(op4, rhs_ones):
    """Single-reduction Arnoldi (reference SINGLE_ALLREDUCE_ARNOLDI,
    src/linsolve_generic.c:668-738): the fused [V^H w, ||w||^2] reduction
    with host-side Pythagoras norm must reproduce the two-reduction solve
    (same iteration count, same converged residual regime)."""
    import jax.numpy as jnp

    b = jnp.asarray(rhs_ones)
    op = lambda v: wilson.d_plus_clover(op4, v)  # noqa: E731
    r1 = fgmres(op, b, tol=1e-10, restart_length=50, max_restarts=20,
                single_reduce=False)
    r2 = fgmres(op, b, tol=1e-10, restart_length=50, max_restarts=20,
                single_reduce=True)
    assert r2.converged
    assert abs(r2.iterations - r1.iterations) <= 1, (r1.iterations,
                                                     r2.iterations)
    assert true_relres(op4, r2.x, b) < 1e-9


def test_fgmres_fused_single_dispatch_parity(op4, rhs_ones):
    """single_reduce="fused" (ONE device program per Arnoldi step with the
    exact norm inside -- the mesh-default reduction policy,
    api.Solver._single_reduce) must reproduce the two-dispatch solve's
    iteration count EXACTLY on the pinned 4^4 config: the math is
    identical, only the dispatch structure changes."""
    import jax.numpy as jnp

    b = jnp.asarray(rhs_ones)
    op = lambda v: wilson.d_plus_clover(op4, v)  # noqa: E731
    r1 = fgmres(op, b, tol=1e-10, restart_length=50, max_restarts=20,
                single_reduce=False)
    r2 = fgmres(op, b, tol=1e-10, restart_length=50, max_restarts=20,
                single_reduce="fused")
    assert r2.converged
    assert r2.iterations == r1.iterations, (r1.iterations, r2.iterations)
    assert true_relres(op4, r2.x, b) < 1e-9


def test_fgmres_with_identity_preconditioner_matches(op4, rhs_ones):
    import jax.numpy as jnp

    b = jnp.asarray(rhs_ones)
    res = fgmres(lambda v: wilson.d_plus_clover(op4, v), b,
                 preconditioner=lambda v: v,
                 tol=1e-8, restart_length=50, max_restarts=20)
    assert res.converged
    assert true_relres(op4, res.x, b) < 1e-7


def test_cgn(op4, rhs_ones):
    import jax.numpy as jnp

    b = jnp.asarray(rhs_ones)
    res = cgn(lambda v: wilson.d_plus_clover(op4, v),
              lambda v: wilson.d_dagger(op4, v),
              b, tol=1e-8, max_iter=20000)
    assert res.converged
    assert true_relres(op4, res.x, b) < 1e-7


def test_bicgstab(op4, rhs_ones):
    import jax.numpy as jnp

    b = jnp.asarray(rhs_ones)
    res = bicgstab(lambda v: wilson.d_plus_clover(op4, v), b,
                   tol=1e-8, max_iter=20000)
    assert res.converged
    assert true_relres(op4, res.x, b) < 1e-7


def test_fgcr(op4, rhs_ones):
    import jax.numpy as jnp

    b = jnp.asarray(rhs_ones)
    res = fgcr(lambda v: wilson.d_plus_clover(op4, v), b,
               tol=1e-8, restart_length=50, max_restarts=20)
    assert res.converged
    assert true_relres(op4, res.x, b) < 1e-7


def test_fgmres_mp_4to4(op4, rhs_ones):
    """Mixed-precision FGMRES (reference fgmres_MP, src/linsolve.c:153):
    f32 Arnoldi reaches 1e-10 true (f64) residual via restart refreshes."""
    import jax.numpy as jnp

    from ddalphaamg_tpu.solvers import fgmres_mp

    ops = {}

    def apply_mp(v):
        rd = jnp.zeros((), v.dtype).real.dtype
        if rd not in ops:
            cd = jnp.complex128 if rd == jnp.float64 else jnp.complex64
            ops[rd] = op4.astype(cd)
        return wilson.d_plus_clover(ops[rd], v)

    b = jnp.asarray(rhs_ones)
    res = fgmres_mp(apply_mp, b, tol=1e-10, restart_length=30,
                    max_restarts=30)
    assert res.converged, res.relres
    # the f32 inner loop alone cannot certify 1e-10: check in f64
    assert true_relres(op4, np.asarray(res.x.astype(jnp.complex128)),
                       rhs_ones) < 1e-9
    # the inner basis really was float32, the restart refresh float64
    assert np.dtype("float32") in ops and np.dtype("float64") in ops


def test_device_gcr_matches_fgmres(op4, rhs_ones):
    """Device-side GCR == GMRES (minimal-residual equivalence): same
    iteration count to a loose tolerance, correct residual."""
    import jax
    import jax.numpy as jnp

    from ddalphaamg_tpu.solvers.device_gmres import device_gcr

    b = jnp.asarray(rhs_ones, dtype=jnp.complex128)
    op = lambda v: wilson.d_plus_clover(op4, v)  # noqa: E731
    tol = 5e-2

    x, iters, relres2, aux = jax.jit(
        lambda b: device_gcr(op, b, m=60, tol=tol, n_restarts=1))(b)
    assert float(relres2) < tol ** 2
    assert true_relres(op4, np.asarray(x), rhs_ones) < tol

    ref = fgmres(op, b, tol=tol, restart_length=60, max_restarts=1)
    assert abs(float(iters) - ref.iterations) <= 1, (float(iters), ref.iterations)


def test_device_gcr_restarts_and_freeze(op4, rhs_ones):
    import jax
    import jax.numpy as jnp

    from ddalphaamg_tpu.solvers.device_gmres import device_gcr

    b = jnp.asarray(rhs_ones, dtype=jnp.complex128)
    op = lambda v: wilson.d_plus_clover(op4, v)  # noqa: E731
    # tight tol with restarts
    x, iters, relres2, _ = device_gcr(op, b, m=30, tol=1e-8, n_restarts=6)
    assert true_relres(op4, np.asarray(x), rhs_ones) < 1e-7
    # freeze: generous budget must not spend iterations after convergence
    x2, iters2, _, _ = device_gcr(op, b, m=30, tol=1e-1, n_restarts=6)
    assert float(iters2) < 35
