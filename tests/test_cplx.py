"""Split-complex (CArray) algebra: equivalence against jnp complex."""

import numpy as np
import pytest
import jax.numpy as jnp

from ddalphaamg_tpu import cplx


def rnd(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape) + 1j * rng.normal(size=shape)


def test_mul_add_conj():
    a, b = rnd((5, 7), 0), rnd((5, 7), 1)
    ca, cb = cplx.as_carray(a), cplx.as_carray(b)
    np.testing.assert_allclose(cplx.to_numpy(ca * cb), a * b, atol=1e-13)
    np.testing.assert_allclose(cplx.to_numpy(ca + cb), a + b, atol=1e-13)
    np.testing.assert_allclose(cplx.to_numpy(ca - cb), a - b, atol=1e-13)
    np.testing.assert_allclose(cplx.to_numpy(cplx.conj(ca)), a.conj(), atol=1e-13)
    np.testing.assert_allclose(cplx.to_numpy(ca / cb), a / b, atol=1e-12)
    np.testing.assert_allclose(cplx.to_numpy(ca * 2.5), a * 2.5, atol=1e-13)
    np.testing.assert_allclose(cplx.to_numpy(ca * (1 + 2j)), a * (1 + 2j), atol=1e-13)


@pytest.mark.parametrize("karatsuba", [True, False])
def test_einsum(karatsuba):
    a, b = rnd((4, 6, 3, 3), 2), rnd((4, 6, 2, 3), 3)
    out = cplx.einsum("...ab,...sb->...sa", cplx.as_carray(a), cplx.as_carray(b),
                      karatsuba=karatsuba)
    ref = np.einsum("...ab,...sb->...sa", a, b)
    np.testing.assert_allclose(cplx.to_numpy(out), ref, atol=1e-12)


def test_phase_mul():
    a = rnd((3, 4), 4)
    ca = cplx.as_carray(a)
    for val in (1, -1, 1j, -1j, 0.5 - 0.5j):
        np.testing.assert_allclose(cplx.to_numpy(cplx.phase_mul(val, ca)),
                                   val * a, atol=1e-13)
        np.testing.assert_allclose(cplx.to_numpy(cplx.phase_mul(val, ca, -1.0)),
                                   -val * a, atol=1e-13)


def test_vdot_norm():
    a, b = rnd((64,), 5), rnd((64,), 6)
    ca, cb = cplx.as_carray(a), cplx.as_carray(b)
    v = cplx.vdot(ca, cb)
    np.testing.assert_allclose(complex(float(v.re), float(v.im)),
                               np.vdot(a, b), atol=1e-12)
    np.testing.assert_allclose(float(cplx.norm2(ca)),
                               np.linalg.norm(a) ** 2, atol=1e-12)


def test_inv():
    a = rnd((5, 6, 6), 7)
    a = a + np.conj(np.swapaxes(a, -1, -2)) + 6 * np.eye(6)  # well conditioned
    inv = cplx.inv(cplx.as_carray(a))
    prod = np.einsum("...ij,...jk->...ik", cplx.to_numpy(inv), a)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(6), prod.shape),
                               atol=1e-10)


def test_block_qr():
    a = rnd((3, 2, 12, 5), 8)
    q = cplx.block_qr(cplx.as_carray(a))
    qn = cplx.to_numpy(q)
    g = np.einsum("...mi,...mj->...ij", qn.conj(), qn)
    np.testing.assert_allclose(g, np.broadcast_to(np.eye(5), g.shape), atol=1e-12)
    # spans the same column space: a = q (q^H a)
    coef = np.einsum("...mi,...mj->...ij", qn.conj(), a)
    np.testing.assert_allclose(np.einsum("...mi,...ij->...mj", qn, coef), a, atol=1e-10)


def test_at_and_roll():
    a = rnd((4, 4), 9)
    ca = cplx.as_carray(a)
    np.testing.assert_allclose(cplx.to_numpy(cplx.roll(ca, 1, 0)),
                               np.roll(a, 1, 0), atol=1e-13)
    b = ca.at[1, :].add(cplx.as_carray(np.ones(4) * (1 + 1j)))
    ref = a.copy()
    ref[1, :] += 1 + 1j
    np.testing.assert_allclose(cplx.to_numpy(b), ref, atol=1e-13)


def test_herm_inv_cholesky():
    """Cholesky-factored Hermitian inverse (reference
    selfcoupling_cholesky_decomposition, src/oddeven_generic.c:24-117):
    exact on well-conditioned blocks, and at least as accurate as the LU
    inverse on an ill-conditioned (small-quark-mass regime) batch in f32."""
    rng = np.random.default_rng(11)
    d, nb = 6, 32
    w = rng.normal(size=(nb, d, d)) + 1j * rng.normal(size=(nb, d, d))
    q, _ = np.linalg.qr(w)
    # condition number ~3e4: the near-kappa_crit clover regime where a
    # dense-inverse path loses accuracy in f32
    eig = 10.0 ** np.linspace(-4.5, 0.0, d)
    a = np.einsum("bij,j,bkj->bik", q, eig, q.conj())
    a = 0.5 * (a + np.swapaxes(a, -1, -2).conj())

    # f64 exactness (complex path)
    ainv = np.asarray(cplx.herm_inv(jnp.asarray(a)))
    resid = np.einsum("bij,bjk->bik", a, ainv) - np.eye(d)
    assert np.abs(resid).max() < 1e-9

    # f32 split path: Cholesky inverse residual within the cond*eps bound
    # and not worse than the LU inverse
    a32 = cplx.as_carray(a.astype(np.complex64))
    i_h = cplx.to_numpy(cplx.herm_inv(a32))
    i_lu = cplx.to_numpy(cplx.inv(a32))
    r_h = np.abs(np.einsum("bij,bjk->bik", a, i_h) - np.eye(d)).max()
    r_lu = np.abs(np.einsum("bij,bjk->bik", a, i_lu) - np.eye(d)).max()
    assert r_h < 5e-2, r_h            # ~cond * eps_f32
    assert r_h <= 2.0 * r_lu, (r_h, r_lu)
