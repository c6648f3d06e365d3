"""Gauge IO: plaquette must match the value stored in the file header
(the reference's own correctness check on read, src/io.c:500-507)."""

import numpy as np
import pytest

from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu import gauge


@pytest.mark.parametrize("conf_fixture", ["conf4", "conf8"])
def test_plaquette_matches_header(conf_fixture, request):
    path = request.getfixturevalue(conf_fixture)
    U, header_plaq = dio.read_gauge_field(path, anti_periodic=False)
    plaq = float(gauge.average_plaquette(U))
    assert abs(plaq - header_plaq) < 1e-10, (plaq, header_plaq)


def test_links_are_su3(conf4):
    U, _ = dio.read_gauge_field(conf4, anti_periodic=False)
    ident = np.einsum("dtzyxab,dtzyxcb->dtzyxac", U, U.conj())
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), ident.shape), atol=1e-12)
    det = np.linalg.det(U)
    np.testing.assert_allclose(det, 1.0, atol=1e-12)


def test_anti_periodic_sign(conf4):
    U0, _ = dio.read_gauge_field(conf4, anti_periodic=False)
    U1, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    np.testing.assert_allclose(U1[0, -1], -U0[0, -1])
    np.testing.assert_allclose(U1[0, :-1], U0[0, :-1])
    np.testing.assert_allclose(U1[1:], U0[1:])


def test_write_read_roundtrip(tmp_path, conf4):
    U, plaq = dio.read_gauge_field(conf4, anti_periodic=True)
    out = tmp_path / "roundtrip.conf"
    dio.write_gauge_field(str(out), U, plaq, anti_periodic=True)
    U2, plaq2 = dio.read_gauge_field(str(out), anti_periodic=True)
    np.testing.assert_allclose(U2, U)
    assert plaq2 == plaq


def test_random_gauge_is_su3():
    U = gauge.random_gauge((4, 4, 4, 4), seed=1)
    U = np.asarray(U)
    ident = np.einsum("dtzyxab,dtzyxcb->dtzyxac", U, U.conj())
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), ident.shape), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-12)


def test_hdf5_test_vector_roundtrip(tmp_path):
    """HDF5 test-vector checkpoint (reference HAVE_HDF5 vector_io layout:
    eigenmodes/eigenmode<i> datasets, src/io.c:32-370)."""
    pytest.importorskip("h5py")
    from ddalphaamg_tpu import io as dio

    rng = np.random.default_rng(0)
    tvs = rng.normal(size=(3, 2, 2, 2, 2, 12)) + 1j * rng.normal(size=(3, 2, 2, 2, 2, 12))
    path = str(tmp_path / "tvs.h5")
    dio.write_test_vectors(path, tvs, header={"m0": -0.5})
    back = dio.read_test_vectors(path, (2, 2, 2, 2), n=3)
    np.testing.assert_allclose(back, tvs, atol=0)


def test_hdf5_gauge_roundtrip(tmp_path, conf4):
    """HDF5 gauge configuration (reference HAVE_HDF5 gauge io,
    src/io.c:703): .h5 paths dispatch transparently from
    read/write_gauge_field and round-trip exactly."""
    pytest.importorskip("h5py")
    U, plaq = dio.read_gauge_field(conf4, anti_periodic=True)
    out = str(tmp_path / "conf.h5")
    dio.write_gauge_field(out, U, plaq, anti_periodic=True)
    U2, plaq2 = dio.read_gauge_field(out, anti_periodic=True)
    np.testing.assert_allclose(U2, U)
    assert plaq2 == plaq


def test_ddhmc_roundtrip(tmp_path, conf4):
    """DDHMC converter (reference conf/convert/DDHMC2DDalphaAMG.c): writing
    the 4^4 config in DDHMC odd-site layout and converting back must be the
    identity, and the CLI converter must produce a byte-faithful binary."""
    U, plaq = dio.read_gauge_field(conf4, anti_periodic=False)
    dd = tmp_path / "conf.ddhmc"
    dio.write_gauge_field_ddhmc(str(dd), U, plaq, anti_periodic=False)
    U2, plaq2 = dio.read_gauge_field_ddhmc(str(dd), anti_periodic=False)
    assert plaq2 == plaq
    np.testing.assert_allclose(U2, U)

    from ddalphaamg_tpu import tools
    out = tmp_path / "conf.bin"
    assert tools.main(["fromddhmc", str(dd), str(out)]) == 0
    U3, plaq3 = dio.read_gauge_field(str(out), anti_periodic=False)
    assert plaq3 == plaq
    np.testing.assert_allclose(U3, U)
