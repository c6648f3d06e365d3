"""Production sharded stencil ops (parallel/shard_ops.py): every SoA
stencil operation under a t/z device mesh matches the single-device result,
including the fused Pallas kernels (interpret mode on CPU), and the compiled
fine-op HLO contains collective-permutes but NO lattice-sized all-gather
(VERDICT r2 item 1 "done" criteria)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddalphaamg_tpu import cplx, gauge, parallel
from ddalphaamg_tpu.geometry import Geometry
from ddalphaamg_tpu.operators import wilson
from ddalphaamg_tpu.operators.coarse import CoarseOperator
from ddalphaamg_tpu.operators.stencil import (CoarseStencilSoA,
                                              WilsonStencilSoA)

M0, CSW = -0.5, 1.0


def _rand_c(rng, *shape):
    return cplx.as_carray(
        (rng.normal(size=shape) + 1j * rng.normal(size=shape))
        .astype(np.complex64))


@pytest.fixture(scope="module")
def fine_pair():
    """(single-device stencil, sharded stencil, phi, phi_sharded) on a
    (2, 2, 1, 1) t/z mesh, XLA SoA kernels."""
    lat = (8, 8, 4, 4)
    U = gauge.random_gauge(lat, seed=0, dtype=jnp.complex64)
    op = wilson.WilsonOperator.from_gauge(cplx.as_carray(U), m0=M0, csw=CSW)
    geom = Geometry(lattice=lat, block=(2, 2, 2, 2))
    s = WilsonStencilSoA.build(op, geom, dtype=jnp.complex64, use_pallas=False)
    rng = np.random.default_rng(3)
    phi = _rand_c(rng, 4, 3, lat[0], lat[1], lat[2] * lat[3])
    mesh = parallel.make_solver_mesh(n_devices=4, dims=(2, 2, 1, 1))
    s_sh = parallel.shard_stencil(mesh, s)
    assert s_sh.mesh is not None
    phi_sh = parallel.shard_field(mesh, phi, lat, soa=True)
    return s, s_sh, phi, phi_sh


@pytest.mark.parametrize("opname", ["full_op", "block_op", "hop_intra"])
def test_wilson_sharded_op_parity(fine_pair, opname):
    s, s_sh, phi, phi_sh = fine_pair
    want = cplx.to_numpy(jax.jit(getattr(s, opname))(phi))
    got = cplx.to_numpy(jax.jit(getattr(s_sh, opname))(phi_sh))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_wilson_sharded_self_inv_parity(fine_pair):
    s, s_sh, phi, phi_sh = fine_pair
    want = cplx.to_numpy(jax.jit(lambda t, v: t.self_inv(v, t.odd))(s, phi))
    got = cplx.to_numpy(jax.jit(lambda t, v: t.self_inv(v, t.odd))(s_sh, phi_sh))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_wilson_sharded_hlo_no_allgather(fine_pair):
    """The compiled sharded fine operator must halo-exchange faces
    (collective-permute), never all-gather the lattice (the failure mode of
    un-partitioned pallas_call under GSPMD)."""
    _, s_sh, _, phi_sh = fine_pair
    txt = jax.jit(lambda t, v: t.full_op(v)).lower(
        s_sh, phi_sh).compile().as_text()
    assert "collective-permute" in txt
    assert "all-gather" not in txt


def test_wilson_sharded_pallas_interpret_parity():
    """use_pallas=True under shard_map (the production multi-chip TPU
    config), interpret mode on the CPU mesh."""
    lat = (4, 4, 4, 4)
    U = gauge.random_gauge(lat, seed=1, dtype=jnp.complex64)
    op = wilson.WilsonOperator.from_gauge(cplx.as_carray(U), m0=M0, csw=CSW)
    geom = Geometry(lattice=lat, block=(2, 2, 2, 2))
    s = WilsonStencilSoA.build(op, geom, dtype=jnp.complex64, use_pallas=True)
    rng = np.random.default_rng(5)
    phi = _rand_c(rng, 4, 3, 4, 4, 16)
    want_full = cplx.to_numpy(jax.jit(s.full_op)(phi))
    want_blk = cplx.to_numpy(jax.jit(s.block_op)(phi))
    mesh = parallel.make_solver_mesh(n_devices=4, dims=(2, 2, 1, 1))
    s_sh = parallel.shard_stencil(mesh, s)
    assert s_sh.use_pallas and s_sh.mesh is not None
    phi_sh = parallel.shard_field(mesh, phi, lat, soa=True)
    got_full = cplx.to_numpy(jax.jit(s_sh.full_op)(phi_sh))
    got_blk = cplx.to_numpy(jax.jit(s_sh.block_op)(phi_sh))
    np.testing.assert_allclose(got_full, want_full, atol=3e-5)
    np.testing.assert_allclose(got_blk, want_blk, atol=3e-5)


@pytest.fixture(scope="module")
def coarse_pair():
    d = 8
    lat = (8, 4, 4, 2)
    rng = np.random.default_rng(7)
    A = _rand_c(rng, *lat, d, d)
    A = cplx.CArray(A.re + 5 * jnp.asarray(
        np.broadcast_to(np.eye(d, dtype=np.float32), (*lat, d, d))), A.im)
    cop = CoarseOperator(A, _rand_c(rng, 4, *lat, d, d),
                         _rand_c(rng, 4, *lat, d, d))
    geom = Geometry(lattice=lat, block=(2, 2, 2, 2), dof=d)
    s = CoarseStencilSoA.build(cop, geom)
    v = _rand_c(rng, d, lat[0], lat[1], lat[2] * lat[3])
    mesh = parallel.make_solver_mesh(n_devices=8, dims=(4, 2, 1, 1))
    s_sh = parallel.shard_stencil(mesh, s)
    assert s_sh.mesh is not None
    v_sh = parallel.shard_field(mesh, v, lat, soa=True)
    return s, s_sh, v, v_sh


@pytest.mark.parametrize("opname", ["full_op", "hop", "block_op", "hop_intra"])
def test_coarse_sharded_op_parity(coarse_pair, opname):
    s, s_sh, v, v_sh = coarse_pair
    want = cplx.to_numpy(jax.jit(getattr(s, opname))(v))
    got = cplx.to_numpy(jax.jit(getattr(s_sh, opname))(v_sh))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_coarse_sharded_self_inv_parity(coarse_pair):
    s, s_sh, v, v_sh = coarse_pair
    want = cplx.to_numpy(jax.jit(lambda t, x: t.self_inv(x, t.odd))(s, v))
    got = cplx.to_numpy(jax.jit(lambda t, x: t.self_inv(x, t.odd))(s_sh, v_sh))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_coarse_sharded_hlo_no_allgather(coarse_pair):
    _, s_sh, _, v_sh = coarse_pair
    txt = jax.jit(lambda t, x: t.full_op(x)).lower(
        s_sh, v_sh).compile().as_text()
    assert "collective-permute" in txt
    assert "all-gather" not in txt


def test_coarse_sharded_relayout_tz(coarse_pair):
    """A z-sharding mesh repacks the blocks to the "tz" layout at shard
    time and still matches the single-device result."""
    s, _, v, _ = coarse_pair
    assert s.layout == "t"
    lat = s.geom.lattice
    mesh = parallel.make_solver_mesh(n_devices=4, dims=(2, 2, 1, 1))
    s_sh = parallel.shard_stencil(mesh, s)
    assert s_sh.layout == "tz" and s_sh.mesh is not None
    v_sh = parallel.shard_field(mesh, v, lat, soa=True)
    for opname in ("full_op", "block_op"):
        want = cplx.to_numpy(jax.jit(getattr(s, opname))(v))
        got = cplx.to_numpy(jax.jit(getattr(s_sh, opname))(v_sh))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_coarse_sharded_pallas_interpret_parity():
    """use_pallas=True under shard_map for the COARSE packed kernel (the
    production multi-chip TPU config), interpret mode on the CPU mesh."""
    d = 8
    lat = (4, 4, 2, 2)
    rng = np.random.default_rng(11)
    A = _rand_c(rng, *lat, d, d)
    A = cplx.CArray(A.re + 5 * jnp.asarray(
        np.broadcast_to(np.eye(d, dtype=np.float32), (*lat, d, d))), A.im)
    cop = CoarseOperator(A, _rand_c(rng, 4, *lat, d, d),
                         _rand_c(rng, 4, *lat, d, d))
    geom = Geometry(lattice=lat, block=(2, 2, 2, 2), dof=d)
    s = CoarseStencilSoA.build(cop, geom, use_pallas=True)
    v = _rand_c(rng, d, lat[0], lat[1], lat[2] * lat[3])
    want_full = cplx.to_numpy(jax.jit(s.full_op)(v))
    want_blk = cplx.to_numpy(jax.jit(s.block_op)(v))
    mesh = parallel.make_solver_mesh(n_devices=4, dims=(2, 2, 1, 1))
    s_sh = parallel.shard_stencil(mesh, s)
    assert s_sh.use_pallas and s_sh.mesh is not None and s_sh.layout == "tz"
    v_sh = parallel.shard_field(mesh, v, lat, soa=True)
    got_full = cplx.to_numpy(jax.jit(s_sh.full_op)(v_sh))
    got_blk = cplx.to_numpy(jax.jit(s_sh.block_op)(v_sh))
    np.testing.assert_allclose(got_full, want_full, atol=3e-5)
    np.testing.assert_allclose(got_blk, want_blk, atol=3e-5)


@pytest.mark.slow
def test_gathering_policy_three_levels_8dev():
    """Intermediate-level gathering policy (reference idle-rank gathering,
    src/gathering_generic.c:44-209) at 3 levels / 8 devices: a middle level
    whose per-device volume falls below MGConfig.min_local_sites is
    REPLICATED (no halo traffic in its stencil applies); forcing
    min_local_sites=0 shards it instead, and the traced multigrid cycle
    agrees between the two policies."""
    from ddalphaamg_tpu.mg.hierarchy import LevelConfig, MGConfig, Multigrid

    lat = (4, 8, 4, 4)
    mesh = parallel.make_solver_mesh(n_devices=8, dims=(2, 4, 1, 1))
    U = gauge.random_gauge(lat, seed=2, dtype=jnp.complex64)
    op = parallel.shard_operator(
        mesh, wilson.WilsonOperator.from_gauge(cplx.as_carray(U),
                                               m0=M0, csw=CSW))
    levels = [
        LevelConfig(lattice=lat, block=(2, 2, 2, 2), post_smooth_iter=1,
                    block_iter=2, num_test_vectors=4, setup_iter=0),
        LevelConfig(lattice=(2, 4, 2, 2), block=(1, 1, 1, 1),
                    num_test_vectors=4),
        LevelConfig(lattice=(1, 2, 1, 1), block=(1, 1, 1, 1)),
    ]
    outs = {}
    for policy, mls in (("gathered", 256), ("sharded", 0)):
        mg = Multigrid(op, MGConfig(levels=list(levels), mesh=mesh,
                                    fine_layout="soa", split=True, seed=3,
                                    min_local_sites=mls))
        lv = mg._levels()
        assert len(lv) == 3
        # depth-1 local volume on this mesh is 1*1*2*2 = 4 sites
        assert lv[1].replicated == (policy == "gathered")
        assert lv[2].replicated   # coarsest always gathered
        rng = np.random.default_rng(5)
        eta = parallel.shard_field(
            mesh, cplx.as_carray(
                (rng.normal(size=(*lat, 4, 3))
                 + 1j * rng.normal(size=(*lat, 4, 3))).astype(np.complex64)),
            lat)
        outs[policy] = cplx.to_numpy(mg(eta))
    np.testing.assert_allclose(outs["gathered"], outs["sharded"], atol=2e-4)
