"""Multi-RHS solves: the 12-RHS propagator workload batched into single
device programs (no reference analog -- SURVEY 2.14.8 notes multiple-RHS
is absent upstream; on TPU the batch dimension feeds the MXU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ddalphaamg_tpu import api, config, cplx
from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu.mg.hierarchy import Multigrid, MGConfig, LevelConfig
from ddalphaamg_tpu.operators import wilson

LAT = (4, 4, 4, 4)
M0, CSW = -0.5, 1.0

INI = """
d0 global lattice: 4 4 4 4
d0 block lattice: 2 2 2 2
d0 post smooth iter: 2
d0 block iter: 4
d0 test vectors: 4
d0 setup iter: 1
number of levels: 2
method: 2
interpolation: 2
m0: -0.5
csw: 1.0
tolerance for relative residual: 1e-9
iterations between restarts: 30
maximum of restarts: 20
"""


def _rand_logical(seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(*LAT, 4, 3)) + 1j * rng.normal(size=(*LAT, 4, 3))
    return a.astype(np.complex64)


@pytest.mark.slow
def test_inner_restart_batch_matches_single(conf4):
    """inner_restart_batch (vmapped device restarts) is lane-for-lane the
    single-RHS inner_restart: vmap of the early-exit GCR freezes converged
    lanes without perturbing the others."""
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    op = wilson.WilsonOperator.from_gauge(cplx.as_carray(U), m0=M0, csw=CSW)
    mg = Multigrid(op, MGConfig(levels=[
        LevelConfig(lattice=LAT, block=(2, 2, 2, 2), post_smooth_iter=2,
                    block_iter=4, num_test_vectors=4, setup_iter=1),
        LevelConfig(lattice=(2, 2, 2, 2), block=(1, 1, 1, 1)),
    ], coarse_layout="soa", split=True, seed=7))

    r0 = cplx.as_carray(_rand_logical(0))
    r1 = cplx.as_carray(_rand_logical(1))
    tols = np.array([1e-2, 1e-1], np.float32)

    z0, it0, _ = mg.inner_restart(r0, float(tols[0]), m=8)
    z1, it1, _ = mg.inner_restart(r1, float(tols[1]), m=8)
    rb = cplx.stack([r0, r1])
    zb, itb, _ = mg.inner_restart_batch(rb, tols, m=8)

    itb = np.asarray(itb)
    assert itb[0] == float(np.asarray(it0)), (itb, it0)
    assert itb[1] == float(np.asarray(it1)), (itb, it1)
    np.testing.assert_allclose(np.asarray(zb.re[0]), np.asarray(z0.re),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(zb.re[1]), np.asarray(z1.re),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(zb.im[0]), np.asarray(z0.im),
                               atol=2e-5)


@pytest.mark.slow
def test_solve_multi_batched_df_path(conf4, monkeypatch):
    """solve_multi on the production (double-float, device-restart) path:
    forced split representation on CPU (DDAAMG_FORCE_SPLIT) drives exactly
    the TPU code path; every lane must reach the requested tolerance,
    verified against an independently computed true residual."""
    monkeypatch.setenv("DDAAMG_FORCE_SPLIT", "1")
    p = config.parse_ini(INI)
    solver = api.Solver(p)
    solver.read_conf(conf4)
    solver.setup()

    b = np.stack([np.ones((*LAT, 4, 3), np.complex128),
                  _rand_logical(42).astype(np.complex128)])
    x, infos = solver.solve_multi(b, tol=1e-9)
    assert x.shape == b.shape
    for i, info in enumerate(infos):
        assert info.converged, (i, info)
        assert info.relres < 1e-9, (i, info)
        # independent residual check (double-float against the f64 operator)
        r = solver.true_residual(x[i], b[i])
        assert r < 5e-9, (i, r)

    # the single-RHS production path is the B=1 case of the same driver
    # (_solve_df_device delegates to _solve_df_multi); it must agree with
    # the batched lane up to batched-while_loop rounding
    x0s, info0 = solver.solve(b[0], tol=1e-9)
    assert info0.converged and info0.relres < 1e-9, info0
    np.testing.assert_allclose(np.asarray(x0s), x[0], atol=1e-7)


def test_solve_multi_fallback_loop(conf4):
    """Without the device-restart driver (plain CPU representation),
    solve_multi falls back to sequential solves against the shared
    preconditioner and returns the same per-RHS structure."""
    p = config.parse_ini(INI)
    p.tol = 1e-8
    solver = api.Solver(p)
    solver.read_conf(conf4)
    solver.setup()
    b = np.stack([np.ones((*LAT, 4, 3), np.complex128),
                  _rand_logical(7).astype(np.complex128)])
    x, infos = solver.solve_multi(b)
    assert x.shape == b.shape and len(infos) == 2
    for i, info in enumerate(infos):
        assert info.converged, (i, info)
        assert solver.true_residual(x[i], b[i]) < 5e-8


def test_solve_multi_restart_cap_surfaced(conf4, monkeypatch):
    """The multi-RHS inner-restart cap (device GCR basis memory budget,
    VERDICT r2 weak item 6) is surfaced in SolveInfo.inner_restart_cap,
    and the solve still converges when a tight budget forces the floor
    (extra double-float refreshes, not a silent wrong answer)."""
    monkeypatch.setenv("DDAAMG_FORCE_SPLIT", "1")
    monkeypatch.setenv("DDAAMG_INNER_BASIS_BUDGET", "1")  # force the floor
    p = config.parse_ini(INI)
    solver = api.Solver(p)
    solver.read_conf(conf4)
    solver.setup()
    b = np.stack([np.ones((*LAT, 4, 3), np.complex128),
                  _rand_logical(7).astype(np.complex128)])
    x, infos = solver.solve_multi(b, tol=1e-8)
    for i, info in enumerate(infos):
        assert info.inner_restart_cap == 5, info.inner_restart_cap  # floor
        assert info.converged, (i, info)
        assert solver.true_residual(x[i], b[i]) < 5e-8
