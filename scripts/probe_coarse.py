#!/usr/bin/env python
"""Measure coarse-level apply implementations on the real chip.

The intermediate d=32 stencil is the cycle hotspot (BENCH_r02 coarse
fraction 0.483).  Candidates (all via CoarseStencilSoA, which now stores
PACKED blocks -- operators/pallas_coarse.py):
  A. XLA fallback on the packed layout (use_pallas=False)
  B. fused Pallas kernel (use_pallas=True)
Each for f32 and bf16 block storage, layouts "t" and "tz".
HBM floor (blocks read once): 9 d^2 V * bytes.
"""
import os
import sys
import time

os.environ.setdefault("DDAAMG_NO_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ddalphaamg_tpu import cplx
from ddalphaamg_tpu.geometry import Geometry
from ddalphaamg_tpu.operators.coarse import CoarseOperator
from ddalphaamg_tpu.operators.stencil import CoarseStencilSoA

LAT = tuple(int(e) for e in os.environ.get("PROBE_LAT", "8,8,8,8").split(","))
D = int(os.environ.get("PROBE_D", "32"))
CHAIN = int(os.environ.get("PROBE_CHAIN", "50"))


def timed(fn, *args):
    """Time CHAIN applies inside ONE jitted program (the relay pays ~27 ms
    per dispatch, which would dominate per-call timing)."""

    @jax.jit
    def chain(*a):
        v = a[-1]

        def body(_, x):
            w = fn(*a[:-1], x)
            return w * jax.lax.rsqrt(cplx.norm2(w))
        return cplx.norm2(jax.lax.fori_loop(0, CHAIN, body, v))

    _ = float(chain(*args))          # compile + warm
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(chain(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - 0.028, 1e-9) / CHAIN


def main():
    rng = np.random.default_rng(0)
    t, z, y, x = LAT
    m = y * x
    V = t * z * m

    def rc(*s):
        return cplx.CArray(
            jnp.asarray(rng.normal(size=s).astype(np.float32)),
            jnp.asarray(rng.normal(size=s).astype(np.float32)))

    A = rc(*LAT, D, D)
    Df = rc(4, *LAT, D, D)
    Db = rc(4, *LAT, D, D)
    geom = Geometry(LAT, (2, 2, 2, 2), dof=D)
    cop = CoarseOperator(A, Df, Db)
    v = rc(D, t, z, m)

    flops = 9 * 8 * D * D * V
    f32_bytes = 9 * D * D * V * 8
    fullop = lambda st, vv: st.full_op(vv)

    ref = None
    for layout in ("t", "tz"):
        for use_pallas in (False, True):
            s = CoarseStencilSoA.build(cop, geom, layout=layout,
                                       use_pallas=use_pallas)
            tag = f"{layout:2s} {'pallas' if use_pallas else 'xla   '}"
            got = cplx.to_numpy(jax.jit(fullop)(s, v))
            if ref is None:
                ref = got
            err = np.abs(got - ref).max()
            dt = timed(fullop, s, v)
            print(f"{tag} f32 : {dt*1e3:8.3f} ms {flops/dt/1e9:8.1f} GF/s  "
                  f"err {err:.2e} (floor {f32_bytes/600e9*1e3:.3f} ms)",
                  flush=True)
            sc = s.compress()
            got = cplx.to_numpy(jax.jit(fullop)(sc, v))
            err = np.abs(got - ref).max()
            dt = timed(fullop, sc, v)
            print(f"{tag} bf16: {dt*1e3:8.3f} ms {flops/dt/1e9:8.1f} GF/s  "
                  f"err {err:.2e} (floor {f32_bytes/2/600e9*1e3:.3f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()
