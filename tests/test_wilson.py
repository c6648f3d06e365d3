"""Wilson-clover operator correctness.

Checks (mirroring the reference's built-in test_routine suite):
  * vectorized JAX operator == independent per-site numpy implementation
  * gamma5-Hermiticity: gamma5 D is Hermitian  (physics invariant)
  * free-field (unit gauge) spectrum is known analytically
  * clover term is Hermitian per site
"""

import numpy as np
import pytest

from ddalphaamg_tpu import gauge
from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu.operators import wilson

LAT = (4, 4, 4, 4)
M0, CSW = -0.5, 1.0


@pytest.fixture(scope="module")
def op4(conf4):
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    return wilson.WilsonOperator.from_gauge(U, m0=M0, csw=CSW)


def random_spinor(lat, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(*lat, 4, 3)) + 1j * rng.normal(size=(*lat, 4, 3)))


def test_clover_hermitian(op4):
    c = np.asarray(op4.clover)
    np.testing.assert_allclose(c, np.conj(np.swapaxes(c, -1, -2)), atol=1e-12)


def test_matches_naive_reference(op4):
    phi = random_spinor(LAT, 1)
    eta_fast = np.asarray(wilson.d_plus_clover(op4, phi))
    eta_naive = wilson.d_plus_clover_naive(
        np.asarray(op4.links), np.asarray(op4.clover), phi
    )
    np.testing.assert_allclose(eta_fast, eta_naive, atol=1e-11)


def test_gamma5_hermiticity(op4):
    # <gamma5 D x, y> == <x, gamma5 D y>
    x = random_spinor(LAT, 2)
    y = random_spinor(LAT, 3)
    g5dx = np.asarray(wilson.g5_d_plus_clover(op4, x))
    g5dy = np.asarray(wilson.g5_d_plus_clover(op4, y))
    lhs = np.vdot(y, g5dx)
    rhs = np.vdot(g5dy, x)
    assert abs(lhs - rhs) / abs(lhs) < 1e-12


def test_dagger_identity(op4):
    # <D x, y> == <x, D^dagger y>
    x = random_spinor(LAT, 4)
    y = random_spinor(LAT, 5)
    dx = np.asarray(wilson.d_plus_clover(op4, x))
    ddy = np.asarray(wilson.d_dagger(op4, y))
    assert abs(np.vdot(y, dx) - np.vdot(ddy, x)) / abs(np.vdot(y, dx)) < 1e-12


def test_free_field_constant_mode():
    # On a unit gauge field with periodic BC and csw arbitrary (clover = 0
    # field strength), D applied to a constant spinor gives m0 * spinor:
    # hopping sums to -(1/2)*sum_mu[(1-g)+(1+g)] = -4, diagonal is 4+m0.
    U = gauge.unit_gauge(LAT)
    op = wilson.WilsonOperator.from_gauge(U, m0=-0.3, csw=1.0)
    phi = np.ones((*LAT, 4, 3), dtype=complex)
    eta = np.asarray(wilson.d_plus_clover(op, phi))
    np.testing.assert_allclose(eta, -0.3 * phi, atol=1e-12)


def test_shift_update(op4):
    phi = random_spinor(LAT, 6)
    shifted = wilson.shift_diagonal(op4, 0.25)
    a = np.asarray(wilson.d_plus_clover(shifted, phi))
    b = np.asarray(wilson.d_plus_clover(op4, phi)) + 0.25 * phi
    np.testing.assert_allclose(a, b, atol=1e-11)
