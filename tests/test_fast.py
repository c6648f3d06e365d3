"""SoA (TPU fast-path) stencils must match the logical-layout operators."""

import numpy as np
import jax.numpy as jnp
import pytest

from ddalphaamg_tpu import cplx
from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu.operators import fast, wilson

LAT = (4, 4, 4, 4)


@pytest.fixture(scope="module")
def op4(conf4):
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    return wilson.WilsonOperator.from_gauge(cplx.as_carray(U), m0=-0.5, csw=1.0)


def test_layout_roundtrip():
    rng = np.random.default_rng(0)
    phi = cplx.as_carray(rng.normal(size=(*LAT, 4, 3))
                         + 1j * rng.normal(size=(*LAT, 4, 3)))
    back = fast.spinor_from_soa(fast.spinor_to_soa(phi), LAT)
    np.testing.assert_allclose(cplx.to_numpy(back), cplx.to_numpy(phi))


def test_rollers_match_logical():
    rng = np.random.default_rng(1)
    phi = cplx.as_carray(rng.normal(size=(*LAT, 4, 3)) + 0j)
    soa = fast.spinor_to_soa(phi)
    roll = fast.make_rollers(LAT, rdtype=jnp.float64)
    for mu in range(4):
        for shift in (-1, 1):
            ref = cplx.roll(phi, shift, mu)
            got = fast.spinor_from_soa(roll(soa, shift, mu), LAT)
            np.testing.assert_allclose(cplx.to_numpy(got), cplx.to_numpy(ref),
                                       err_msg=f"mu={mu} shift={shift}")


def test_soa_operator_matches(op4):
    rng = np.random.default_rng(2)
    phi = cplx.as_carray(rng.normal(size=(*LAT, 4, 3))
                         + 1j * rng.normal(size=(*LAT, 4, 3)))
    ref = cplx.to_numpy(wilson.d_plus_clover(op4, phi))
    roll = fast.make_rollers(LAT, rdtype=jnp.float64)
    out = fast.d_plus_clover_soa(fast.links_to_soa(op4.links),
                                 fast.clover_to_soa(op4.clover),
                                 fast.spinor_to_soa(phi), roll)
    got = cplx.to_numpy(fast.spinor_from_soa(out, LAT))
    np.testing.assert_allclose(got, ref, atol=1e-12)
