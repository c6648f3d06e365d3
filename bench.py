#!/usr/bin/env python
"""Headline benchmark: Wilson-clover Dslash throughput on one chip.

Prints ONE JSON line:
  {"metric": "dslash_gflops", "value": N, "unit": "GFLOP/s", "vs_baseline": R}

Uses the TPU fast path (split-complex SoA layout with fused lattice-minor
axis, operators/fast.py).  The flop model is the reference's analytic count:
1920 flop/site (552 clover + 1368 hopping, src/init_generic.c:58-60).
vs_baseline is measured GFLOP/s over the BASELINE.md target of 70% of the
single-chip HBM roofline for this operator:
  bytes/site = 4*9*8 (links) + 2*36*8 (clover) + 2*12*8 (in+out) = 1056 B
  roofline   = HBM_BW * 1920 / 1056;   target = 0.7 * roofline.

Timing note: this environment's device relay has a ~31 ms fixed overhead per
synchronized call, so the kernel is timed as a long fori_loop chain with a
single scalar readback, subtracting the measured overhead.
"""

import json
import os
import sys
import time

os.environ.setdefault("DDAAMG_NO_X64", "1")  # split-complex f32 path

import jax
import jax.numpy as jnp
import numpy as np


LAT = (16, 16, 16, 16)
HBM_BW_GB = 819.0  # v5e; used only to normalize vs_baseline
CHAIN = 400


def main():
    from ddalphaamg_tpu import cplx, gauge
    from ddalphaamg_tpu.operators import fast, wilson

    platform = jax.devices()[0].platform
    U = gauge.random_gauge_split(LAT, seed=0)
    op = wilson.WilsonOperator.from_gauge(U, m0=-0.5, csw=1.0)
    links = fast.links_to_soa(op.links)
    clov = fast.clover_to_soa(op.clover)
    roll = fast.make_rollers(LAT, rdtype=jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    soa_shape = (4, 3, LAT[0], LAT[1], LAT[2] * LAT[3])
    phi = cplx.CArray(jax.random.normal(k1, soa_shape, dtype=jnp.float32),
                      jax.random.normal(k2, soa_shape, dtype=jnp.float32))

    @jax.jit
    def chain(l, c, v):
        def body(i, x):
            return fast.d_plus_clover_soa(l, c, x, roll) * 0.05
        return cplx.norm2(jax.lax.fori_loop(0, CHAIN, body, v))

    @jax.jit
    def empty(v):
        return cplx.norm2(v)

    float(chain(links, clov, phi))  # compile
    float(empty(phi))
    overhead = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(empty(phi))
        overhead = min(overhead, time.perf_counter() - t0)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(links, clov, phi))
        best = min(best, time.perf_counter() - t0)
    per_apply = max(best - overhead, 1e-9) / CHAIN

    vol = int(np.prod(LAT))
    flops = 1920 * vol
    gflops = flops / per_apply / 1e9
    bytes_per_site = 4 * 9 * 8 + 2 * 36 * 8 + 2 * 12 * 8
    roofline = HBM_BW_GB * flops / (bytes_per_site * vol)
    target = 0.7 * roofline
    print(json.dumps({
        "metric": "dslash_gflops",
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / target, 3),
        "detail": {
            "lattice": list(LAT), "layout": "soa-split-f32", "platform": platform,
            "ms_per_apply": round(per_apply * 1e3, 4),
            "roofline_gflops": round(roofline, 1),
            "sync_overhead_ms": round(overhead * 1e3, 1),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
