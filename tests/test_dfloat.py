"""Double-float (two-float32) arithmetic and the extended-precision
Wilson-clover residual (operators/dfloat.py) -- the TPU substitute for the
reference's f64 outer precision (src/linsolve.c:153).  Verified here on CPU
against true f64; the same XLA graphs run on the chip (on-chip agreement
with these f64 results was measured at ~5e-15)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu.operators import dfloat as dfm
from ddalphaamg_tpu.operators import wilson

LAT = (4, 4, 4, 4)


def test_df_primitives():
    rng = np.random.default_rng(0)
    a64 = rng.normal(size=20000) * 10.0 ** rng.integers(-6, 6, size=20000)
    b64 = rng.normal(size=20000) * 10.0 ** rng.integers(-6, 6, size=20000)
    A, B = dfm.df_from64(a64), dfm.df_from64(b64)
    # conversion round trip at the ~49-bit double-float precision
    np.testing.assert_allclose(dfm.df_to64(A), a64, rtol=4e-15, atol=0)
    s = jax.jit(dfm.add2)(A, B)
    # error scale: the operand magnitudes (cancellation amplifies the
    # ~2^-49 representation error of the inputs arbitrarily in |a+b| terms)
    rel = (np.abs(dfm.df_to64(s) - (a64 + b64))
           / np.maximum(np.abs(a64), np.abs(b64)))
    assert rel.max() < 1e-14
    p = jax.jit(dfm.mul2)(A, B)
    rel = np.abs(dfm.df_to64(p) - (a64 * b64)) / np.maximum(np.abs(a64 * b64), 1e-300)
    assert rel.max() < 1e-13


def test_df_dslash_matches_f64(conf4):
    """The double-float Wilson-clover apply reproduces the f64 operator to
    ~1e-14 -- the accuracy that lets TPU verify 1e-10 residuals."""
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    op = wilson.WilsonOperator.from_gauge(jnp.asarray(U, jnp.complex128),
                                          m0=-0.5, csw=1.0)
    wdf = dfm.build_wilson_df(np.asarray(op.links), np.asarray(op.clover), LAT)
    roll = dfm.make_rollers_df(LAT)
    rng = np.random.default_rng(1)
    phi64 = rng.normal(size=(*LAT, 4, 3)) + 1j * rng.normal(size=(*LAT, 4, 3))
    want = np.asarray(wilson.d_plus_clover(op, jnp.asarray(phi64)))

    phi_soa = dfm.spinor_to_soa_df(dfm.cdf_from64(phi64), LAT)
    out = jax.jit(lambda w, p: dfm.spinor_from_soa_df(
        dfm.d_plus_clover_df(w, p, roll), LAT))(wdf, phi_soa)
    got = dfm.cdf_to64(out)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-12, rel

    # df norm matches f64 norm
    n_df = dfm.df_to64(jax.jit(dfm.norm2_df)(phi_soa))
    n_64 = np.vdot(phi64, phi64).real
    assert abs(n_df - n_64) / n_64 < 1e-13


def test_df_outer_fns_cached(conf4):
    """build_outer_fns residual agrees with a host-side f64 residual."""
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    op = wilson.WilsonOperator.from_gauge(jnp.asarray(U, jnp.complex128),
                                          m0=-0.5, csw=1.0)
    wdf = dfm.build_wilson_df(np.asarray(op.links), np.asarray(op.clover), LAT)
    residual, extract_r32, axpy = dfm.build_outer_fns(LAT)
    rng = np.random.default_rng(2)

    def to_soa(a):
        return np.transpose(a.reshape(*LAT, 4, 3),
                            (4, 5, 0, 1, 2, 3)).reshape(4, 3, 4, 4, 16)

    b64 = rng.normal(size=(*LAT, 4, 3)) + 1j * rng.normal(size=(*LAT, 4, 3))
    x64 = rng.normal(size=(*LAT, 4, 3)) + 1j * rng.normal(size=(*LAT, 4, 3))
    r, rn2 = residual(wdf, dfm.cdf_from64(to_soa(b64)),
                      dfm.cdf_from64(to_soa(x64)))
    want_r = b64 - np.asarray(wilson.d_plus_clover(op, jnp.asarray(x64)))
    got_n2 = float(np.asarray(rn2[0], np.float64) + np.asarray(rn2[1], np.float64))
    want_n2 = np.vdot(want_r, want_r).real
    assert abs(got_n2 - want_n2) / want_n2 < 1e-12
    # extract_r32 returns the f32 rounding of r in logical layout
    r32 = extract_r32(r)
    got = (np.asarray(r32.re, np.float64) + 1j * np.asarray(r32.im, np.float64))
    assert np.abs(got - want_r).max() < 1e-5
