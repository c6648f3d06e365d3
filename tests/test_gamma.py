"""Clifford-algebra invariants for every supported basis."""

import numpy as np
import pytest

from ddalphaamg_tpu.gamma import GammaBasis, _BASES


@pytest.mark.parametrize("name", sorted(_BASES))
def test_clifford_algebra(name):
    b = GammaBasis(name)
    g = b.dense
    for mu in range(4):
        for nu in range(4):
            anti = g[mu] @ g[nu] + g[nu] @ g[mu]
            expected = 2.0 * np.eye(4) if mu == nu else np.zeros((4, 4))
            np.testing.assert_allclose(anti, expected, atol=1e-14)


@pytest.mark.parametrize("name", sorted(_BASES))
def test_hermiticity(name):
    b = GammaBasis(name)
    for mu in range(4):
        np.testing.assert_allclose(b.dense[mu], b.dense[mu].conj().T, atol=1e-14)


@pytest.mark.parametrize("name", sorted(_BASES))
def test_gamma5_consistency(name):
    # gamma5 ~ gamma_T gamma_Z gamma_Y gamma_X must be +/- diag(1,1,-1,-1)
    b = GammaBasis(name)
    g5 = b.dense[0] @ b.dense[1] @ b.dense[2] @ b.dense[3]
    d = np.diag(g5)
    np.testing.assert_allclose(g5, np.diag(d), atol=1e-14)
    np.testing.assert_allclose(np.abs(d), 1.0, atol=1e-14)
    assert d[0] == d[1] == -d[2] == -d[3]


def test_projector_rank():
    b = GammaBasis()
    for mu in range(4):
        for sign in (+1, -1):
            p = np.eye(4) + sign * b.dense[mu]
            assert np.linalg.matrix_rank(p) == 2
            # idempotent up to factor 2: P^2 = 2P
            np.testing.assert_allclose(p @ p, 2 * p, atol=1e-14)


def test_permutation_form_matches_dense():
    b = GammaBasis()
    rng = np.random.default_rng(0)
    phi = rng.normal(size=(5, 4, 3)) + 1j * rng.normal(size=(5, 4, 3))
    for mu in range(4):
        via_perm = b.apply_gamma(mu, phi)
        via_dense = np.einsum("st,btc->bsc", b.dense[mu], phi)
        np.testing.assert_allclose(via_perm, via_dense, atol=1e-14)
