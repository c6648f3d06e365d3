"""Pallas fused Dslash kernel == SoA XLA path (interpret mode on CPU).

Parity target: d_plus_clover_PRECISION, reference src/dirac_generic.c:159-278.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddalphaamg_tpu import cplx, gauge
from ddalphaamg_tpu.operators import fast, pallas_dslash, wilson


@pytest.mark.parametrize("lat", [(4, 4, 4, 4), (2, 4, 4, 8)])
def test_pallas_dslash_matches_soa(lat):
    U = gauge.random_gauge_split(lat, seed=11)
    op = wilson.WilsonOperator.from_gauge(U, m0=-0.42, csw=1.3)
    links = fast.links_to_soa(op.links).astype_real(jnp.float32)
    clov = fast.clover_to_soa(op.clover).astype_real(jnp.float32)
    cdiag, coff = pallas_dslash.pack_clover(clov)
    roll = fast.make_rollers(lat, rdtype=jnp.float32)

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    shape = (4, 3, lat[0], lat[1], lat[2] * lat[3])
    phi = cplx.CArray(jax.random.normal(k1, shape, dtype=jnp.float32),
                      jax.random.normal(k2, shape, dtype=jnp.float32))

    want = fast.d_plus_clover_soa(links, clov, phi, roll)
    fn = pallas_dslash.build_dslash(lat, interpret=True)
    got = fn(links, cdiag, coff, phi)

    np.testing.assert_allclose(np.asarray(got.re), np.asarray(want.re),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(want.im),
                               rtol=0, atol=2e-5)


def test_pack_clover_roundtrip_apply():
    lat = (2, 2, 4, 4)
    U = gauge.random_gauge_split(lat, seed=3)
    op = wilson.WilsonOperator.from_gauge(U, m0=-0.5, csw=1.0)
    clov = fast.clover_to_soa(op.clover)
    cdiag, coff = pallas_dslash.pack_clover(clov)
    # Hermitian blocks: diagonal must be real
    assert float(jnp.max(jnp.abs(
        jnp.stack([clov.im[:, i, i] for i in range(6)])))) < 1e-6
    assert cdiag.shape == (2, 6, *clov.re.shape[3:])
    assert coff.re.shape == (2, 15, *clov.re.shape[3:])
