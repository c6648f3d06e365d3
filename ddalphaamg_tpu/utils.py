"""Host <-> device marshalling utilities.

The TPU runtime in this environment computes with complex64 on device but
cannot TRANSFER complex arrays in either direction (h2d and d2h of complex
dtypes are unimplemented; complex128 is entirely unsupported on TPU).  All
host/device crossings therefore go through real (re, im) pairs, combined or
split by tiny jitted kernels.  On CPU these helpers are pass-throughs in
behavior (complex transfers work there) but are used uniformly so the same
code runs everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx


def default_split() -> bool:
    """True when the split-complex representation must be used (TPU: the
    runtime executes no complex HLOs at all).  DDAAMG_FORCE_SPLIT=1 forces
    the TPU representation on CPU so tests can drive the production
    split/SoA solver paths without hardware."""
    import os
    if os.environ.get("DDAAMG_FORCE_SPLIT"):
        return True
    return jax.devices()[0].platform != "cpu"


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _split(x):
    return x.real, x.imag


def default_complex_dtype():
    """complex128 where supported (x64 CPU), else complex64 (TPU)."""
    platform = jax.devices()[0].platform
    if platform in ("cpu",) and jax.config.read("jax_enable_x64"):
        return jnp.complex128
    return jnp.complex64


def device_put_complex(x, dtype=None, split=None):
    """numpy (possibly complex) -> device array, complex-transfer-safe.

    split=True yields a cplx.CArray (the TPU representation); split=None
    auto-selects by platform."""
    if isinstance(x, cplx.CArray):
        return x if dtype is None else x.astype(dtype)
    if split is None:
        split = default_split()
    if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
        if split and jnp.iscomplexobj(x):
            return cplx.as_carray(x if dtype is None else x.astype(dtype))
        return x if dtype is None else x.astype(dtype)
    x = np.asarray(x)
    if dtype is None:
        dtype = default_complex_dtype() if np.iscomplexobj(x) else None
    if not np.iscomplexobj(x):
        return jnp.asarray(x, dtype=dtype)
    rdtype = np.zeros((), np.dtype(dtype)).real.dtype
    re = jnp.asarray(np.ascontiguousarray(x.real), dtype=rdtype)
    im = jnp.asarray(np.ascontiguousarray(x.imag), dtype=rdtype)
    if split:
        return cplx.CArray(re, im)
    return _combine(re, im)


def host_array(x) -> np.ndarray:
    """Fetch a real device array to numpy; some TPU relays cannot transfer
    f64, so fall back to an on-device f32 downcast."""
    try:
        return np.asarray(x)
    except Exception:
        return np.asarray(x.astype(jnp.float32))


def host_float(x) -> float:
    """Fetch a device scalar as a python float (f64-transfer-safe)."""
    return float(host_array(x))


def device_get_complex(x) -> np.ndarray:
    """device array -> numpy, complex-transfer-safe."""
    if isinstance(x, cplx.CArray):
        return (host_array(x.re).astype(np.complex128)
                + 1j * host_array(x.im))
    if isinstance(x, np.ndarray):
        return x
    if jnp.iscomplexobj(x):
        re, im = _split(x)
        return host_array(re).astype(np.complex128) + 1j * host_array(im)
    return host_array(x)


@jax.jit
def _vdot_ri(a, b):
    v = cplx.vdot(a, b)
    return cplx.real(v), cplx.imag(v)


def vdot_host(a, b) -> complex:
    """<a, b> as a python complex (device reduction, real transfers)."""
    re, im = _vdot_ri(a, b)
    return complex(float(re), float(im))


@jax.jit
def _norm2(x):
    return cplx.norm2(x)


def norm_host(x) -> float:
    return float(np.sqrt(_norm2(x)))
