"""Split-complex (CArray) end-to-end path: must reproduce the complex path
(and hence the reference parity) exactly up to rounding."""

import numpy as np
import pytest
import jax.numpy as jnp

from ddalphaamg_tpu import cplx
from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu.geometry import Geometry
from ddalphaamg_tpu.mg.hierarchy import Multigrid, MGConfig, LevelConfig
from ddalphaamg_tpu.operators import wilson
from ddalphaamg_tpu.operators.stencil import WilsonStencil
from ddalphaamg_tpu.smoothers.sap import SchwarzPreconditioner
from ddalphaamg_tpu.solvers import fgmres

LAT = (4, 4, 4, 4)
M0, CSW = -0.5, 1.0


@pytest.fixture(scope="module")
def ops(conf4):
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    opc = wilson.WilsonOperator.from_gauge(jnp.asarray(U), m0=M0, csw=CSW)
    ops_ = wilson.WilsonOperator.from_gauge(cplx.as_carray(U), m0=M0, csw=CSW)
    return opc, ops_


def test_clover_and_dslash_equivalence(ops):
    opc, ops_ = ops
    np.testing.assert_allclose(cplx.to_numpy(ops_.clover), np.asarray(opc.clover),
                               atol=1e-11)
    rng = np.random.default_rng(0)
    phi = rng.normal(size=(*LAT, 4, 3)) + 1j * rng.normal(size=(*LAT, 4, 3))
    a = np.asarray(wilson.d_plus_clover(opc, jnp.asarray(phi)))
    b = cplx.to_numpy(wilson.d_plus_clover(ops_, cplx.as_carray(phi)))
    np.testing.assert_allclose(b, a, atol=1e-10)


def test_fgmres_split_parity(ops):
    """Plain GMRES in split mode: same 149 iterations as the reference."""
    _, ops_ = ops
    b = cplx.as_carray(np.ones((*LAT, 4, 3), dtype=complex))
    res = fgmres(lambda v: wilson.d_plus_clover(ops_, v), b,
                 tol=1e-10, restart_length=50, max_restarts=20)
    assert res.converged
    assert res.iterations == 149, res.iterations


def test_sap_split_parity(ops):
    """SAP-preconditioned FGMRES in split mode (f32 smoother parts, f64
    outer parts): 39 iterations like the complex path / reference."""
    _, ops_ = ops
    geom = Geometry(lattice=LAT, block=(2, 2, 2, 2))
    stencil = WilsonStencil.build(ops_, geom, dtype=jnp.complex64)
    M = SchwarzPreconditioner(stencil, block_iter=4, cycles=1, odd_even=False)
    b = cplx.as_carray(np.ones((*LAT, 4, 3), dtype=complex))
    res = fgmres(lambda v: wilson.d_plus_clover(ops_, v), b,
                 preconditioner=M, tol=1e-10, restart_length=50, max_restarts=20)
    assert res.converged
    assert res.iterations == 39, res.iterations
    r = np.ones((*LAT, 4, 3)) - cplx.to_numpy(wilson.d_plus_clover(ops_, res.x))
    rel = np.linalg.norm(r) / np.linalg.norm(np.ones((*LAT, 4, 3)))
    assert rel < 1e-9


@pytest.mark.slow
def test_two_level_split(ops):
    """2-level AMG entirely in split representation."""
    _, ops_ = ops
    cfg = MGConfig(levels=[
        LevelConfig(lattice=LAT, block=(2, 2, 2, 2), post_smooth_iter=2,
                    block_iter=4, num_test_vectors=10, setup_iter=2),
        LevelConfig(lattice=(2, 2, 2, 2), block=(1, 1, 1, 1)),
    ], split=True)
    mg = Multigrid(ops_, cfg)
    mg.bootstrap_setup()
    b = cplx.as_carray(np.ones((*LAT, 4, 3), dtype=complex))
    res = fgmres(lambda v: wilson.d_plus_clover(ops_, v), b,
                 preconditioner=mg, tol=1e-10, restart_length=50, max_restarts=20)
    assert res.converged
    r = np.ones((*LAT, 4, 3)) - cplx.to_numpy(wilson.d_plus_clover(ops_, res.x))
    assert np.linalg.norm(r) / np.linalg.norm(np.ones((*LAT, 4, 3))) < 1e-9
    assert res.iterations <= 16, res.iterations


def test_soa_fine_layout_iteration_parity(conf4):
    """MG with the SoA fine-level layout (the TPU production path) must be
    numerically equivalent to the logical layout: same hierarchy, same
    iteration count, same solution."""
    import jax.numpy as jnp
    import numpy as np

    from ddalphaamg_tpu import io as dio
    from ddalphaamg_tpu.mg.hierarchy import LevelConfig, MGConfig, Multigrid
    from ddalphaamg_tpu.operators import wilson
    from ddalphaamg_tpu.solvers import fgmres

    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    op = wilson.WilsonOperator.from_gauge(U, m0=-0.5, csw=1.0)
    b = jnp.ones((4, 4, 4, 4, 4, 3), dtype=complex)

    results = {}
    for layout in ("logical", "soa"):
        cfg = MGConfig(levels=[
            LevelConfig(lattice=(4, 4, 4, 4), block=(2, 2, 2, 2),
                        post_smooth_iter=2, block_iter=4,
                        num_test_vectors=4, setup_iter=0),
            LevelConfig(lattice=(2, 2, 2, 2), block=(1, 1, 1, 1)),
        ], fine_layout=layout, seed=7)
        mg = Multigrid(op, cfg)
        res = fgmres(lambda v: wilson.d_plus_clover(op, v), b,
                     preconditioner=mg, tol=1e-8, restart_length=50,
                     max_restarts=10)
        assert res.converged
        results[layout] = res

    assert results["soa"].iterations == results["logical"].iterations
    np.testing.assert_allclose(np.asarray(results["soa"].x),
                               np.asarray(results["logical"].x), atol=1e-6)


@pytest.mark.slow
def test_coarse_soa_layout_parity(conf8):
    """3-level MG with the dof-major coarse layout (CoarseStencilSoA, the
    reference AoSoA analog) is numerically identical to the site-major
    layout: same iteration count, same solution."""
    U, _ = dio.read_gauge_field(conf8, anti_periodic=True)
    op = wilson.WilsonOperator.from_gauge(U, m0=M0, csw=CSW)
    b = jnp.ones((8, 8, 8, 8, 4, 3), dtype=complex)

    results = {}
    for cl in ("logical", "soa"):
        cfg = MGConfig(levels=[
            LevelConfig(lattice=(8, 8, 8, 8), block=(2, 2, 2, 2),
                        post_smooth_iter=2, block_iter=4,
                        num_test_vectors=4, setup_iter=1),
            LevelConfig(lattice=(4, 4, 4, 4), block=(2, 2, 2, 2),
                        num_test_vectors=4),
            LevelConfig(lattice=(2, 2, 2, 2), block=(1, 1, 1, 1)),
        ], coarse_layout=cl, seed=7)
        mg = Multigrid(op, cfg)
        mg.bootstrap_setup()
        res = fgmres(lambda v: wilson.d_plus_clover(op, v), b,
                     preconditioner=mg, tol=1e-8, restart_length=50,
                     max_restarts=10)
        assert res.converged
        results[cl] = res

    assert results["soa"].iterations == results["logical"].iterations, (
        results["soa"].iterations, results["logical"].iterations)
    np.testing.assert_allclose(np.asarray(results["soa"].x),
                               np.asarray(results["logical"].x), atol=2e-6)


@pytest.mark.slow
def test_coarse_block_bf16(conf4):
    """coarse_block_bf16 stores the coarse stencil blocks in bfloat16 (the
    fields and accumulation stay f32).  The whole coarse hierarchy sits
    inside the flexible outer solver's preconditioner, so the perturbation
    must cost at most a couple of outer iterations while halving the HBM
    traffic of the dominant coarse applies (bench lever on TPU)."""
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    op = wilson.WilsonOperator.from_gauge(U, m0=M0, csw=CSW)
    b = cplx.as_carray(np.ones((*LAT, 4, 3), dtype=complex))

    results = {}
    for bf16 in (False, True):
        cfg = MGConfig(levels=[
            LevelConfig(lattice=LAT, block=(2, 2, 2, 2),
                        post_smooth_iter=2, block_iter=4,
                        num_test_vectors=4, setup_iter=1),
            LevelConfig(lattice=(2, 2, 2, 2), block=(1, 1, 1, 1)),
        ], coarse_layout="soa", split=True, seed=7,
            coarse_block_bf16=bf16)
        mg = Multigrid(op, cfg)
        # compressed views exist exactly on the coarse levels when enabled
        data = mg._level_data()
        comp = [d["stencil"] is not lvl.stencil
                for d, lvl in zip(data, mg._levels())]
        assert comp == [False, bf16], comp
        if bf16:
            assert data[1]["stencil"].A.re.dtype == jnp.bfloat16
            assert data[1]["stencil"].even.dtype == jnp.float32
        mg.bootstrap_setup()
        res = fgmres(lambda v: wilson.d_plus_clover(op, v), b,
                     preconditioner=mg, tol=1e-8, restart_length=50,
                     max_restarts=10)
        assert res.converged
        results[bf16] = res

    assert results[True].iterations <= results[False].iterations + 2, (
        results[True].iterations, results[False].iterations)


def test_dense_inverse_solves_coarsest(conf4):
    """operators/stencil.dense_inverse materializes the coarsest operator by
    applying it to the identity basis and inverts via the real 2n x 2n
    embedding; one matvec with the result must solve the coarsest system
    to rounding (the coarsest_direct fast path, one MXU matmul instead of
    tens of latency-bound GCR iterations)."""
    from ddalphaamg_tpu.operators.stencil import dense_inverse, dense_solve

    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    op = wilson.WilsonOperator.from_gauge(cplx.as_carray(U), m0=M0, csw=CSW)
    cfg = MGConfig(levels=[
        LevelConfig(lattice=LAT, block=(2, 2, 2, 2), post_smooth_iter=2,
                    block_iter=4, num_test_vectors=4, setup_iter=1),
        LevelConfig(lattice=(2, 2, 2, 2), block=(1, 1, 1, 1)),
    ], coarse_layout="soa", split=True, seed=7)
    mg = Multigrid(op, cfg)
    s = list(mg._levels())[-1].stencil

    rng = np.random.default_rng(0)
    b = cplx.as_carray(rng.normal(size=s.field_shape)
                       + 1j * rng.normal(size=s.field_shape))
    b = cplx.CArray(b.re.astype(s.even.dtype), b.im.astype(s.even.dtype))
    bn = float(np.sqrt(cplx.norm2(b)))

    inv = dense_inverse(s)
    r = s.full_op(dense_solve(inv, b))
    err = float(np.sqrt(cplx.norm2(cplx.CArray(r.re - b.re, r.im - b.im)))) / bn
    assert err < 1e-4, err

    # bf16-stored inverse: good to ~1e-2 -- far below the 5e-2 coarse_tol
    inv16 = dense_inverse(s, rdtype=jnp.bfloat16)
    assert inv16.re.dtype == jnp.bfloat16
    r16 = s.full_op(dense_solve(inv16, b))
    e16 = float(np.sqrt(cplx.norm2(
        cplx.CArray(r16.re - b.re, r16.im - b.im)))) / bn
    assert e16 < 5e-2, e16


@pytest.mark.slow
def test_coarsest_direct_solve_parity(conf4):
    """A full MG solve with coarsest_direct (precomputed dense inverse on
    the coarsest level) converges in the same number of outer iterations
    as the GCR coarsest solve: the inverse solves the coarsest system
    *beyond* the 5e-2 GCR tolerance, so the preconditioner only gets
    stronger."""
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    op = wilson.WilsonOperator.from_gauge(U, m0=M0, csw=CSW)
    b = cplx.as_carray(np.ones((*LAT, 4, 3), dtype=complex))

    results = {}
    for direct in (False, True):
        cfg = MGConfig(levels=[
            LevelConfig(lattice=LAT, block=(2, 2, 2, 2),
                        post_smooth_iter=2, block_iter=4,
                        num_test_vectors=4, setup_iter=1),
            LevelConfig(lattice=(2, 2, 2, 2), block=(1, 1, 1, 1)),
        ], coarse_layout="soa", split=True, seed=7,
            coarsest_direct=direct)
        mg = Multigrid(op, cfg)
        mg.bootstrap_setup()
        # lazily built at the first post-setup cycle, never before
        assert list(mg._levels())[-1].dense_inv is None
        res = fgmres(lambda v: wilson.d_plus_clover(op, v), b,
                     preconditioner=mg, tol=1e-8, restart_length=50,
                     max_restarts=10)
        assert res.converged
        assert (list(mg._levels())[-1].dense_inv is not None) == direct
        results[direct] = res

    assert results[True].iterations <= results[False].iterations + 1, (
        results[True].iterations, results[False].iterations)


def test_dense_schur_inverse_solves_coarsest(conf4):
    """The Schur-complement variant of the coarsest direct solve (1/4 the
    stored inverse): odd elimination + one compacted [n/2, n/2] matvec +
    odd reconstruction must solve the full coarsest system to rounding."""
    from ddalphaamg_tpu.operators.stencil import (
        dense_schur_inverse, dense_schur_solve, schur_even_indices)

    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    op = wilson.WilsonOperator.from_gauge(cplx.as_carray(U), m0=M0, csw=CSW)
    cfg = MGConfig(levels=[
        LevelConfig(lattice=LAT, block=(2, 2, 2, 2), post_smooth_iter=2,
                    block_iter=4, num_test_vectors=4, setup_iter=1),
        LevelConfig(lattice=(2, 2, 2, 2), block=(1, 1, 1, 1)),
    ], coarse_layout="soa", split=True, seed=7)
    mg = Multigrid(op, cfg)
    s = list(mg._levels())[-1].stencil

    idx = jnp.asarray(schur_even_indices(s))
    n = int(np.prod(s.field_shape))
    assert idx.shape[0] == n // 2

    rng = np.random.default_rng(3)
    b = cplx.as_carray(rng.normal(size=s.field_shape)
                       + 1j * rng.normal(size=s.field_shape))
    b = cplx.CArray(b.re.astype(s.even.dtype), b.im.astype(s.even.dtype))
    bn = float(np.sqrt(cplx.norm2(b)))

    inv = dense_schur_inverse(s, idx)
    x = dense_schur_solve(s, inv, idx, b)
    r = s.full_op(x)
    err = float(np.sqrt(cplx.norm2(cplx.CArray(r.re - b.re, r.im - b.im)))) / bn
    assert err < 1e-4, err

    # narrow-stored variant stays well inside the 5e-2 coarsest tolerance
    inv16 = dense_schur_inverse(s, idx, rdtype=jnp.bfloat16)
    x16 = dense_schur_solve(s, inv16, idx, b)
    r16 = s.full_op(x16)
    e16 = float(np.sqrt(cplx.norm2(
        cplx.CArray(r16.re - b.re, r16.im - b.im)))) / bn
    assert e16 < 5e-2, e16
