#!/usr/bin/env python
"""Where does the warm rough-solve wall time go?  (VERDICT r3 item 3:
76 ms/outer-iteration with a 0.07 ms fine operator.)

Instruments the production outer loop phase by phase on the real chip:
  * per-restart inner GCR device program (wall + iterations done inside)
  * double-float residual refresh (residual_b program + host fetch)
  * extract/axpy glue dispatches
  * the traced MG cycle standalone, for per-iteration arithmetic

Env: PROBE_TV0/1, PROBE_SETUP0/1, PROBE_CLIP (DDAAMG_INNER_CLIP),
PROBE_LAT.
"""
import os
import sys
import time

os.environ.setdefault("DDAAMG_NO_X64", "1")
if os.environ.get("PROBE_CLIP"):
    os.environ["DDAAMG_INNER_CLIP"] = os.environ["PROBE_CLIP"]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import bench
    from ddalphaamg_tpu import api, config
    from ddalphaamg_tpu.operators import dfloat as dfm
    from ddalphaamg_tpu.utils import host_array

    lat = tuple(int(e) for e in os.environ.get(
        "PROBE_LAT", "16,16,16,16").split(","))
    tv0 = int(os.environ.get("PROBE_TV0", "28"))
    tv1 = int(os.environ.get("PROBE_TV1", "28"))
    si0 = int(os.environ.get("PROBE_SETUP0", "4"))
    si1 = int(os.environ.get("PROBE_SETUP1", "3"))
    p = bench._solver_params("ones", tv=(tv0, tv1), setup=(si0, si1), lat=lat)
    solver = api.Solver(p)
    U, _ = bench._rough_gauge()
    solver.set_conf(U, links_have_bc=True)
    t0 = time.perf_counter()
    solver.setup()
    print(f"setup: {time.perf_counter()-t0:.1f}s", flush=True)

    rhs = config.make_rhs("ones", solver.lattice, seed=5)
    x, info = solver.solve(rhs)   # cold
    print(f"cold solve: {info.solve_time:.2f}s iters {info.iterations}",
          flush=True)

    # ---- instrumented warm solve: replicate _solve_df_multi with timers
    tol = p.tol
    lt = solver.lattice
    t_, z_, y_, x_ = lt
    wdf, _ = solver._wilson_df()

    def to_soa64(a64):
        return np.transpose(a64.reshape(-1, *lt, 4, 3),
                            (0, 5, 6, 1, 2, 3, 4)).reshape(
                                -1, 4, 3, t_, z_, y_ * x_)

    b64 = np.asarray(rhs, np.complex128).reshape(1, *lt, 4, 3)
    b_cdf = dfm.cdf_from64(to_soa64(b64))
    norm_b = np.linalg.norm(b64.reshape(1, -1), axis=1)
    import jax.numpy as jnp
    _, residual_b, extract_b, axpy_b, step_b = solver._df_multi_fns
    zero = jnp.zeros((1, 4, 3, t_, z_, y_ * x_), jnp.float32)
    xc = dfm.CDF(dfm.DF(zero, zero), dfm.DF(zero, zero))
    m_cap = solver._last_m_cap or p.restart_length
    clip = float(os.environ.get("DDAAMG_INNER_CLIP", "1e-5"))
    data = solver.mg._level_data()
    nb_dev = jnp.asarray(norm_b, jnp.float32)

    T = time.perf_counter
    total0 = T()
    it_handles = []
    for restart in range(p.max_restarts):
        t0 = T()
        xc, rel, it, cit = step_b(data, wdf, b_cdf, xc, nb_dev,
                                  jnp.float32(tol), jnp.float32(clip),
                                  m=m_cap)
        t_disp = T() - t0
        t0 = T()
        rel_h = np.asarray(host_array(rel))
        t_fetch = T() - t0
        it_handles.append(it)
        print(f"  [restart {restart}] fused step dispatch {t_disp*1e3:.1f} ms"
              f" + rel fetch {t_fetch*1e3:.1f} ms -> pre-step relres "
              f"{rel_h[0]:.2e}", flush=True)
        if (rel_h < tol).all():
            break
    t0 = T()
    _, rn2 = residual_b(wdf, b_cdf, xc)
    arr = np.asarray(host_array(rn2))
    t_final = T() - t0
    nr = np.sqrt(np.maximum(arr[:, 0] + arr[:, 1], 0.0))
    total = T() - total0
    iters = sum(float(np.asarray(host_array(it))[0]) for it in it_handles)
    print(f"  final verified residual: {t_final*1e3:.1f} ms -> "
          f"{nr[0]/norm_b[0]:.2e}", flush=True)
    print(f"instrumented warm solve total: {total:.2f}s, {iters:.0f} inner "
          f"iters, {total/max(iters,1)*1e3:.0f} ms/iter", flush=True)

    # standalone cycle + fine-op arithmetic for context
    from ddalphaamg_tpu.utils import device_put_complex
    mg = solver.mg
    eta_log = device_put_complex(np.asarray(rhs), split=mg._split)

    def timeit(fn, *args, n=5):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(n):
            t0 = T()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(T() - t0)
        return min(ts)

    t_cycle = timeit(lambda v: mg._run_cycle(v)[0], eta_log)
    lvl = mg._levels()[0]
    v0 = lvl.stencil.from_logical(eta_log)
    t_op = timeit(jax.jit(lambda s, w: s.full_op(w)), lvl.stencil, v0)
    tiny = jax.jit(lambda v: v.re[:1, :1, :1] if hasattr(v, "re") else v[:1])
    rt = timeit(lambda v: tiny(v), v0)
    print(f"standalone: cycle {t_cycle*1e3:.1f} ms, fine op "
          f"{t_op*1e3:.1f} ms, dispatch {rt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
