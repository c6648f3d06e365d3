"""Native C++ IO library == numpy IO path (native/ddio.cpp via ctypes)."""

import numpy as np
import pytest

from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _numpy_read(path, anti_periodic):
    """The pure-numpy reader, bypassing the native fast path."""
    saved = (native._LIB, native._TRIED)
    native._LIB, native._TRIED = None, True
    try:
        return dio.read_gauge_field(path, anti_periodic=anti_periodic)
    finally:
        native._LIB, native._TRIED = saved


@pytest.mark.parametrize("apbc", [True, False])
def test_native_gauge_read_parity(lib, conf4, apbc):
    re, im, plaq_n = native.read_gauge_field(conf4, anti_periodic=apbc)
    U_np, plaq_np = _numpy_read(conf4, apbc)
    np.testing.assert_array_equal(re + 1j * im, U_np)
    assert plaq_n == plaq_np


def test_native_gauge_write_roundtrip(lib, conf4, tmp_path):
    U, plaq = _numpy_read(conf4, True)
    out = str(tmp_path / "conf.out")
    assert native.write_gauge_field(out, U, plaq, anti_periodic=True)
    U2, plaq2 = _numpy_read(out, True)
    np.testing.assert_array_equal(U2, U)
    assert plaq2 == plaq
