"""IO parity: LIME/ILDG round-trips, multi-file configs, test-vector
checkpointing (interpolation: 4), and the conf tools."""

import numpy as np
import pytest

from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu import lime as dlime
from ddalphaamg_tpu import tools


@pytest.fixture(scope="module")
def U4(conf4):
    return dio.read_gauge_field(conf4, anti_periodic=False)


def test_lime_gauge_roundtrip(U4, tmp_path):
    U, plaq = U4
    p = str(tmp_path / "conf.lime")
    dlime.write_gauge_field(p, U, plaq, anti_periodic=False)
    U2, plaq2 = dlime.read_gauge_field(p, anti_periodic=False)
    np.testing.assert_allclose(U2, U, atol=1e-14)
    assert abs(plaq2 - plaq) < 1e-12


def test_lime_tools_convert(conf4, tmp_path):
    out_lime = str(tmp_path / "c.lime")
    out_bin = str(tmp_path / "c.bin")
    assert tools.main(["tolime", conf4, out_lime]) == 0
    assert tools.main(["tobin", out_lime, out_bin]) == 0
    U1, p1 = dio.read_gauge_field(conf4, anti_periodic=False)
    U2, p2 = dio.read_gauge_field(out_bin, anti_periodic=False)
    np.testing.assert_allclose(U2, U1, atol=1e-14)
    assert abs(p2 - p1) < 1e-12


def test_lime_vector_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(2, 2, 2, 2, 4, 3)) + 1j * rng.normal(size=(2, 2, 2, 2, 4, 3))
    p = str(tmp_path / "v.lime")
    dlime.write_vector(p, v)
    v2 = dlime.read_vector(p, lattice=(2, 2, 2, 2))
    np.testing.assert_allclose(v2, v, atol=1e-14)


def test_split_and_multi_read(conf4, tmp_path):
    prefix = str(tmp_path / "conf4")
    names = dio.split_gauge_field(conf4, prefix, (2, 2, 1, 1))
    assert len(names) == 4
    U1, p1 = dio.read_gauge_field(conf4, anti_periodic=True)
    U2, p2 = dio.read_gauge_field_multi(prefix, (2, 2, 1, 1), anti_periodic=True)
    np.testing.assert_allclose(U2, U1, atol=1e-14)
    assert abs(p2 - p1) < 1e-14


def test_vector_header_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    v = rng.normal(size=(2, 2, 2, 2, 12)) + 1j * rng.normal(size=(2, 2, 2, 2, 12))
    p = str(tmp_path / "v.dat")
    dio.write_vector(p, v, header={"m0": -0.5})
    v2 = dio.read_vector(p, (2, 2, 2, 2))
    np.testing.assert_allclose(v2, v, atol=1e-14)
    # headerless write still reads
    dio.write_vector(p, v)
    np.testing.assert_allclose(dio.read_vector(p, (2, 2, 2, 2)), v, atol=1e-14)


@pytest.mark.parametrize("single", [True, False])
def test_test_vector_checkpoint_roundtrip(tmp_path, single):
    rng = np.random.default_rng(2)
    tvs = rng.normal(size=(3, 2, 2, 2, 2, 12)) + 1j * rng.normal(size=(3, 2, 2, 2, 2, 12))
    p = str(tmp_path / "tvs.dat")
    dio.write_test_vectors(p, tvs, single_file=single)
    tvs2 = dio.read_test_vectors(p, (2, 2, 2, 2), n=3, single_file=single)
    np.testing.assert_allclose(tvs2, tvs, atol=1e-14)


def test_conf_generators(tmp_path):
    up = str(tmp_path / "unit")
    tools.make_unit_conf(up, (2, 2, 2, 2))
    U, plaq = dio.read_gauge_field(up, anti_periodic=False)
    assert abs(plaq - 3.0) < 1e-14
    np.testing.assert_allclose(U, np.broadcast_to(np.eye(3), U.shape), atol=0)

    rp = str(tmp_path / "rand")
    plaq = tools.make_random_conf(rp, (2, 2, 2, 2), seed=3)
    U, plaq2 = dio.read_gauge_field(rp, anti_periodic=False)
    assert abs(plaq2 - plaq) < 1e-12
    # unitarity and det 1
    eye = np.einsum("...ab,...cb->...ac", U, np.conj(U))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-12)
    # plaquette consistency with the gauge module on device
    from ddalphaamg_tpu.gauge import average_plaquette
    import jax.numpy as jnp
    assert abs(float(average_plaquette(jnp.asarray(U))) - plaq) < 1e-10


def test_mg_test_vector_checkpoint_e2e(conf4, tmp_path):
    """Full interpolation:4 path: setup -> checkpoint -> fresh solver reads
    the TVs and solves with the same hierarchy quality."""
    from ddalphaamg_tpu import api, config

    ini = """
d0 global lattice: 4 4 4 4
d0 block lattice: 2 2 2 2
d0 test vectors: 6
d0 setup iter: 2
number of levels: 2
method: 2
interpolation: 2
"""
    p = config.parse_ini(ini)
    p.configuration = conf4
    s1 = api.Solver(p)
    s1.read_conf()
    s1.setup()
    tvf = str(tmp_path / "tvs.dat")
    s1.write_test_vectors(tvf)
    x1, info1 = s1.solve()
    assert info1.converged

    p2 = config.parse_ini(ini)
    p2.configuration = conf4
    p2.interpolation = 4
    p2.tv_io_file_name = tvf
    s2 = api.Solver(p2)
    s2.read_conf()
    s2.setup()
    x2, info2 = s2.solve()
    assert info2.converged
    # identical test vectors -> identical hierarchy -> same iteration count
    assert info2.iterations == info1.iterations


def test_rough_conf_targets_reference_plaquette(tmp_path):
    """rough_su3 tunes the average plaquette to the beta=6.0 reference
    configs' value (1.7866 in [0,3]) so benchmark gauge disorder is
    reference-roughness, not a flattering near-free field."""
    rp = str(tmp_path / "rough")
    plaq = tools.make_rough_conf(rp, (8, 8, 8, 8), seed=1)
    assert abs(plaq - 1.7867) < 0.02, plaq
    U, plaq2 = dio.read_gauge_field(rp, anti_periodic=False)
    assert abs(plaq2 - plaq) < 1e-12
    eye = np.einsum("...ab,...cb->...ac", U, np.conj(U))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-12)
