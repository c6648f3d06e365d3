#!/usr/bin/env python
"""Measure coarse-level apply implementations on the real chip.

The intermediate d=32 stencil is the cycle hotspot (BENCH_r02 coarse
fraction 0.483).  Candidates:
  A. current CoarseStencilSoA.full_op (8 rolls + 9 split-complex einsums)
  B. stacked contraction: one einsum over stacked (9, d, d, T, Z, M) blocks
     and (9, d, T, Z, M) shifted fields
  C. Pallas fused kernel (packed [9, T, d*d, ZM] blocks, precomputed shifts)
Each for f32 and bf16 block storage.  HBM floor (blocks read once):
9 d^2 V * bytes.
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


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # relay: force a value fetch to really sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    r = out[0] if isinstance(out, tuple) else out
    _ = float((r.re if hasattr(r, "re") else r).ravel()[0])
    return (time.perf_counter() - t0) / reps


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
    s = CoarseStencilSoA.build(CoarseOperator(A, Df, Db), geom)
    v = rc(D, t, z, m)

    fullop = jax.jit(lambda st, vv: st.full_op(vv))
    dt = timed(fullop, s, v)
    flops = 9 * 8 * D * D * V
    f32_bytes = 9 * D * D * V * 8
    print(f"A  current f32:  {dt*1e3:8.3f} ms   {flops/dt/1e9:8.1f} GF/s  "
          f"(floor {f32_bytes/600e9*1e3:.3f} ms @600GB/s)", flush=True)

    sc = s.compress()
    dt = timed(fullop, sc, v)
    print(f"A' current bf16: {dt*1e3:8.3f} ms   {flops/dt/1e9:8.1f} GF/s  "
          f"(floor {f32_bytes/2/600e9*1e3:.3f} ms)", flush=True)

    # --- B: stacked einsum ---
    Bs = cplx.stack([s.A] + [s.Df[mu] for mu in range(4)]
                    + [s.Db[mu] for mu in range(4)], axis=0)  # [9,d,d,T,Z,M]

    def stacked(bs, vv):
        roll = s._roll()
        vs = cplx.stack([vv] + [roll(vv, -1, mu) for mu in range(4)]
                        + [roll(vv, 1, mu) for mu in range(4)], axis=0)
        return cplx.einsum("kij...,kj...->i...", bs, vs)

    stacked_j = jax.jit(stacked)
    ref = cplx.to_numpy(fullop(s, v))
    got = cplx.to_numpy(stacked_j(Bs, v))
    print("   stacked err:", np.abs(got - ref).max(), flush=True)
    dt = timed(stacked_j, Bs, v)
    print(f"B  stacked f32:  {dt*1e3:8.3f} ms   {flops/dt/1e9:8.1f} GF/s",
          flush=True)
    Bs16 = Bs.astype_real(jnp.bfloat16)

    def stacked16(bs, vv):
        return stacked(bs.astype_real(jnp.float32), vv)
    dt = timed(jax.jit(stacked16), Bs16, v)
    print(f"B' stacked bf16: {dt*1e3:8.3f} ms   {flops/dt/1e9:8.1f} GF/s",
          flush=True)

    # --- C: pallas fused ---
    from ddalphaamg_tpu.operators import pallas_coarse as pc
    packed = pc.pack_blocks(Bs)
    kern = pc.build_coarse_apply(LAT, D)

    def pallas_apply(p, vv):
        roll = s._roll()
        vs = cplx.stack([vv] + [roll(vv, -1, mu) for mu in range(4)]
                        + [roll(vv, 1, mu) for mu in range(4)], axis=0)
        return kern(p, vs)

    pj = jax.jit(pallas_apply)
    got = cplx.to_numpy(pj(packed, v))
    print("   pallas err:", np.abs(got - ref).max(), flush=True)
    dt = timed(pj, packed, v)
    print(f"C  pallas f32:   {dt*1e3:8.3f} ms   {flops/dt/1e9:8.1f} GF/s",
          flush=True)
    packed16 = packed.astype_real(jnp.bfloat16)
    got = cplx.to_numpy(pj(packed16, v))
    print("   pallas bf16 err:", np.abs(got - ref).max(), flush=True)
    dt = timed(pj, packed16, v)
    print(f"C' pallas bf16:  {dt*1e3:8.3f} ms   {flops/dt/1e9:8.1f} GF/s",
          flush=True)


if __name__ == "__main__":
    main()
