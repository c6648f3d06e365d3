#!/usr/bin/env python
"""Where does the multi-RHS batch time go?  Times the batched (B-lane)
device programs against their single-lane counterparts on the rough16
headline hierarchy: the full inner restart, the bare MG cycle, the fine
operator, and the smoother -- each as wall time minus the measured
dispatch roundtrip.  PROBE_B sets the batch (default 12)."""
import os
import sys
import time

os.environ.setdefault("DDAAMG_NO_X64", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from ddalphaamg_tpu import api, config, cplx
    from ddalphaamg_tpu.utils import device_put_complex, host_float

    B = int(os.environ.get("PROBE_B", "12"))
    p = bench._solver_params("ones", tv=(28, 28), setup=(4, 3))
    solver = api.Solver(p)
    U, _ = bench._rough_gauge()
    solver.set_conf(U, links_have_bc=True)
    t0 = time.perf_counter()
    solver.setup()
    print(f"setup: {time.perf_counter()-t0:.1f}s", flush=True)
    mg = solver.mg

    rng = np.random.default_rng(7)
    lat = solver.lattice
    r1 = device_put_complex(
        (rng.normal(size=(*lat, 4, 3)) + 1j * rng.normal(size=(*lat, 4, 3))),
        split=mg._split).astype_real(jnp.float32)
    rB = device_put_complex(
        (rng.normal(size=(B, *lat, 4, 3))
         + 1j * rng.normal(size=(B, *lat, 4, 3))),
        split=mg._split).astype_real(jnp.float32)

    def timeit(fn, n=3):
        out = fn()
        jax.block_until_ready(out)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tiny = jax.jit(lambda v: v.re[:1, :1] if hasattr(v, "re") else v[:1])
    rt = timeit(lambda: tiny(jnp.zeros((4, 4), jnp.float32)))
    print(f"dispatch roundtrip: {rt*1e3:.1f} ms")

    # full inner restart, single (m=50) vs batched (bench's m cap)
    m1, mB = 50, max(5, min(50, 150_000_000 // (int(np.prod(lat)) * 12 * B)))
    t_s = timeit(lambda: mg.inner_restart(r1, 1e-5, m=m1)[0]) - rt
    tols = np.full(B, 1e-5, np.float32)
    t_b = timeit(lambda: mg.inner_restart_batch(rB, tols, m=mB)[0]) - rt
    it_s = float(host_float(mg.inner_restart(r1, 1e-5, m=m1)[1]))
    it_b = float(np.asarray(
        jax.device_get(mg.inner_restart_batch(rB, tols, m=mB)[1])).mean())
    print(f"inner restart single (m={m1}): {t_s*1e3:8.1f} ms  ({it_s:.0f} it)")
    print(f"inner restart batch B={B} (m={mB}): {t_b*1e3:8.1f} ms  "
          f"(mean {it_b:.1f} it)  per-lane {t_b/B*1e3:.1f} ms  "
          f"speedup {t_s*B/t_b:.2f}x")

    # bare cycle
    data1 = mg._level_data()
    dataB = mg._level_data_batched()
    cyc1 = jax.jit(lambda d, v: mg._cycle_entry(d, v, 0, float(mg.cfg.kcycle_tol))[0])
    cycB = jax.jit(lambda d, vb: jax.vmap(
        lambda v: mg._cycle_entry(d, v, 0, float(mg.cfg.kcycle_tol))[0])(vb))
    s = data1[0]["stencil"]
    v1 = s.from_logical(r1)
    sB = dataB[0]["stencil"]
    vB = jax.vmap(sB.from_logical)(rB)
    t_c1 = timeit(lambda: cyc1(data1, v1)) - rt
    t_cB = timeit(lambda: cycB(dataB, vB)) - rt
    print(f"cycle single: {t_c1*1e3:8.1f} ms   batch: {t_cB*1e3:8.1f} ms  "
          f"per-lane {t_cB/B*1e3:.1f} ms  speedup {t_c1*B/t_cB:.2f}x")

    # fine operator
    op1 = jax.jit(s.full_op)
    opB = jax.jit(jax.vmap(sB.full_op))
    t_o1 = timeit(lambda: op1(v1)) - rt
    t_oB = timeit(lambda: opB(vB)) - rt
    print(f"fine op single (pallas): {t_o1*1e3:8.2f} ms   "
          f"batch (einsum-view): {t_oB*1e3:8.2f} ms  per-lane "
          f"{t_oB/B*1e3:.2f} ms  speedup {t_o1*B/t_oB:.2f}x")

    # smoother (one preconditioner application)
    from ddalphaamg_tpu.smoothers.sap import sap_smooth
    lvl = mg._levels()[0]
    binv1 = data1[0].get("block_inv")
    sm1 = jax.jit(lambda v: sap_smooth(s, data1[0]["colors"], v,
                                       lvl.cfg.post_smooth_iter,
                                       lvl.cfg.block_iter, True,
                                       block_inv=binv1))
    smB = jax.jit(jax.vmap(lambda v: sap_smooth(
        sB, dataB[0]["colors"], v, lvl.cfg.post_smooth_iter,
        lvl.cfg.block_iter, True, block_inv=dataB[0].get("block_inv"))))
    t_m1 = timeit(lambda: sm1(v1)) - rt
    t_mB = timeit(lambda: smB(vB)) - rt
    print(f"smoother single: {t_m1*1e3:8.2f} ms   batch: {t_mB*1e3:8.2f} ms  "
          f"per-lane {t_mB/B*1e3:.2f} ms  speedup {t_m1*B/t_mB:.2f}x")


if __name__ == "__main__":
    main()
