#!/usr/bin/env python
"""Headline benchmark: Wilson-clover Dslash throughput on one chip.

Prints ONE JSON line:
  {"metric": "dslash_gflops", "value": N, "unit": "GFLOP/s", "vs_baseline": R}

The flop model is the reference's analytic count: 1920 flop/site
(552 clover self-coupling + 1368 hopping, src/init_generic.c:58-60).
vs_baseline is measured GFLOP/s divided by the BASELINE.md target of 70% of
the single-chip HBM roofline for this operator:
  bytes/site = 4*9*8 (links) + 2*36*8 (clover) + 2*12*8 (in+out) = 1056 B
  roofline   = HBM_BW * 1920 / 1056;   target = 0.7 * roofline.
"""

import json
import os
import sys
import time

# Run on whatever platform the driver provides (TPU under axon; CPU fallback).
os.environ.setdefault("DDAAMG_NO_X64", "1")  # complex64 path on TPU

import jax
import jax.numpy as jnp
import numpy as np


LAT = (16, 16, 16, 16)
HBM_BW_GB = 819.0  # v5e; used only to normalize vs_baseline


def main():
    from ddalphaamg_tpu import gauge
    from ddalphaamg_tpu.operators import wilson

    platform = jax.devices()[0].platform
    U = gauge.random_gauge(LAT, seed=0, dtype=jnp.complex64)
    op = wilson.WilsonOperator.from_gauge(U, m0=-0.5, csw=1.0)
    key = jax.random.PRNGKey(1)
    phi = jax.lax.complex(
        jax.random.normal(key, (*LAT, 4, 3), dtype=jnp.float32),
        jax.random.normal(jax.random.PRNGKey(2), (*LAT, 4, 3), dtype=jnp.float32))

    n_inner = 50

    @jax.jit
    def chain(o, v):
        def body(i, x):
            return wilson.d_plus_clover(o, x) * 0.25
        return jax.lax.fori_loop(0, n_inner, body, v)

    out = chain(op, phi)
    out.block_until_ready()  # compile
    reps = 4
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(op, phi)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n_inner)

    vol = int(np.prod(LAT))
    flops = 1920 * vol
    gflops = flops / best / 1e9
    bytes_per_site = 4 * 9 * 8 + 2 * 36 * 8 + 2 * 12 * 8
    roofline = HBM_BW_GB * 1e9 * flops / (bytes_per_site * vol) / 1e9
    target = 0.7 * roofline
    print(json.dumps({
        "metric": "dslash_gflops",
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / target, 3),
        "detail": {
            "lattice": list(LAT), "dtype": "complex64", "platform": platform,
            "ms_per_apply": round(best * 1e3, 4),
            "roofline_gflops": round(roofline, 1),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
