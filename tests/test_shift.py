"""Cheap mass-shift updates (reference shift_update,
src/dirac_generic.c:504-551): +delta * I propagates exactly through every
level of the hierarchy with NO bootstrap, and an m0 scan with
`shift update: 1` performs zero bootstraps at matching iteration counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddalphaamg_tpu import api, config, cplx
from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu.geometry import Geometry
from ddalphaamg_tpu.operators import wilson
from ddalphaamg_tpu.operators.coarse import CoarseOperator
from ddalphaamg_tpu.operators.stencil import (CoarseStencil, CoarseStencilSoA,
                                              WilsonStencil, WilsonStencilSoA,
                                              shift_stencil)

DELTA = 0.07


def _rand_c(rng, *shape):
    return cplx.as_carray(
        (rng.normal(size=shape) + 1j * rng.normal(size=shape))
        .astype(np.complex64))


def test_shift_stencil_wilson_logical(conf4):
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    geom = Geometry((4, 4, 4, 4), (2, 2, 2, 2))
    s1 = WilsonStencil.build(
        wilson.WilsonOperator.from_gauge(U, m0=-0.5, csw=1.0), geom)
    s2 = WilsonStencil.build(
        wilson.WilsonOperator.from_gauge(U, m0=-0.5 + DELTA, csw=1.0), geom)
    ss = shift_stencil(s1, DELTA)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(4, 4, 4, 4, 4, 3))
                    + 1j * rng.normal(size=(4, 4, 4, 4, 4, 3))).astype(s1.dtype)
    np.testing.assert_allclose(np.asarray(ss.full_op(v)),
                               np.asarray(s2.full_op(v)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ss.self_inv(v, ss.odd)),
                               np.asarray(s2.self_inv(v, s2.odd)), atol=1e-5)


def test_shift_stencil_wilson_soa(conf4):
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    geom = Geometry((4, 4, 4, 4), (2, 2, 2, 2))
    mk = lambda m0: WilsonStencilSoA.build(
        wilson.WilsonOperator.from_gauge(cplx.as_carray(U), m0=m0, csw=1.0),
        geom, dtype=jnp.complex64, use_pallas=False)
    s1, s2 = mk(-0.5), mk(-0.5 + DELTA)
    ss = shift_stencil(s1, jnp.float32(DELTA))
    rng = np.random.default_rng(1)
    v = _rand_c(rng, 4, 3, 4, 4, 16)
    for a, b in [(ss.full_op(v), s2.full_op(v)),
                 (ss.self_op(v), s2.self_op(v)),
                 (ss.self_inv(v, ss.odd), s2.self_inv(v, s2.odd)),
                 (ss.block_op(v), s2.block_op(v))]:
        np.testing.assert_allclose(cplx.to_numpy(a), cplx.to_numpy(b),
                                   atol=1e-4)
    # the packed Pallas operands must track the shifted clover
    np.testing.assert_allclose(np.asarray(ss.cdiag),
                               np.asarray(s2.cdiag), atol=1e-5)


@pytest.mark.parametrize("cls", [CoarseStencil, CoarseStencilSoA])
def test_shift_stencil_coarse(cls):
    d = 6
    lat = (4, 4, 4, 4)
    rng = np.random.default_rng(2)
    A = _rand_c(rng, *lat, d, d)
    eye = np.broadcast_to(np.eye(d, dtype=np.float32), (*lat, d, d))
    A = cplx.CArray(A.re + 4 * jnp.asarray(eye), A.im)
    Df, Db = _rand_c(rng, 4, *lat, d, d), _rand_c(rng, 4, *lat, d, d)
    geom = Geometry(lat, (2, 2, 2, 2), dof=d)
    s1 = cls.build(CoarseOperator(A, Df, Db), geom)
    s2 = cls.build(CoarseOperator(
        cplx.CArray(A.re + DELTA * jnp.asarray(eye), A.im), Df, Db), geom)
    ss = shift_stencil(s1, jnp.float32(DELTA))
    v = _rand_c(rng, *s1.field_shape)
    np.testing.assert_allclose(cplx.to_numpy(ss.full_op(v)),
                               cplx.to_numpy(s2.full_op(v)), atol=1e-4)
    np.testing.assert_allclose(cplx.to_numpy(ss.self_inv(v, ss.odd)),
                               cplx.to_numpy(s2.self_inv(v, s2.odd)),
                               atol=1e-4)


INI = """
d0 global lattice: 4 4 4 4
d0 block lattice: 2 2 2 2
d0 post smooth iter: 2
d0 block iter: 4
d0 test vectors: 6
d0 setup iter: 2
number of levels: 2
method: 2
interpolation: 2
mixed precision: 1
odd even preconditioning: 1
kcycle: 1
m0: -0.5
csw: 1.0
tolerance for relative residual: 1e-9
iterations between restarts: 50
maximum of restarts: 20
right hand side: 0
"""


def test_solver_shift_update_no_bootstrap(conf4, monkeypatch):
    """api.Solver.shift_update: zero bootstraps, hierarchy consistent with a
    full rebuild (Galerkin shift is exactly diagonal), solve converges at
    reference-class iteration counts."""
    from ddalphaamg_tpu.mg.hierarchy import Multigrid

    p = config.parse_ini(INI)
    p.configuration = conf4
    s = api.Solver(p)
    s.read_conf()
    s.setup()
    x0, i0 = s.solve()
    assert i0.converged

    boots = {"n": 0}
    orig = Multigrid.bootstrap_setup

    def counting(self, *a, **k):
        boots["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(Multigrid, "bootstrap_setup", counting)

    new_m0 = p.m0 + DELTA
    s.shift_update(new_m0)
    assert boots["n"] == 0, "shift_update must not bootstrap"
    assert s.p.m0 == new_m0

    # the shifted fine stencil equals a stencil rebuilt at the new mass
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    op_new = wilson.WilsonOperator.from_gauge(U, m0=new_m0, csw=1.0)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(4, 4, 4, 4, 4, 3))
                    + 1j * rng.normal(size=(4, 4, 4, 4, 4, 3)))
    got = np.asarray(wilson.d_plus_clover(s.op.astype(v.dtype), v))
    want = np.asarray(wilson.d_plus_clover(op_new.astype(v.dtype), v))
    np.testing.assert_allclose(got, want, atol=1e-10)

    # the shifted coarse level equals the Galerkin rebuild with the SAME
    # test vectors (P unchanged): delta * P^H P = delta * I exactly
    tvs = s.mg.get_test_vectors()
    s_ref = api.Solver(config.parse_ini(INI))
    s_ref.p.m0 = new_m0
    s_ref.p.configuration = conf4
    s_ref.read_conf()
    s_ref.p.interpolation = 4
    s_ref.p.tv_io_file_name = "unused"
    s_ref.mg = Multigrid(s_ref.op, s_ref._mg_config())
    s_ref.mg.set_test_vectors(
        tvs.reshape(tvs.shape[0], 4, 4, 4, 4, 4, 3))
    A_shift = s.mg._levels()[1].stencil.A
    A_ref = s_ref.mg._levels()[1].stencil.A
    np.testing.assert_allclose(cplx.to_numpy(A_shift), cplx.to_numpy(A_ref),
                               atol=5e-5)

    # iteration count within +-1 of a full fresh setup at the new mass
    x1, i1 = s.solve()
    assert i1.converged
    s2 = api.Solver(config.parse_ini(INI))
    s2.p.m0 = new_m0
    s2.p.configuration = conf4
    s2.read_conf()
    s2.setup()
    x2, i2 = s2.solve()
    assert i2.converged
    assert abs(i1.iterations - i2.iterations) <= 1, (i1.iterations,
                                                     i2.iterations)
