#!/usr/bin/env python
"""Why does the inner GCR stop short of its target?  Run ONE inner restart
standalone at several targets and report claimed iterations + internal
relres + externally-verified reduction."""
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
    from ddalphaamg_tpu.utils import device_put_complex, host_array, host_float

    tv0 = int(os.environ.get("PROBE_TV0", "28"))
    tv1 = int(os.environ.get("PROBE_TV1", "28"))
    si0 = int(os.environ.get("PROBE_SETUP0", "4"))
    si1 = int(os.environ.get("PROBE_SETUP1", "3"))
    p = bench._solver_params("ones", tv=(tv0, tv1), setup=(si0, si1))
    solver = api.Solver(p)
    U, _ = bench._rough_gauge()
    solver.set_conf(U, links_have_bc=True)
    t0 = time.perf_counter()
    solver.setup()
    print(f"setup: {time.perf_counter()-t0:.1f}s", flush=True)
    mg = solver.mg

    rhs = config.make_rhs("ones", solver.lattice, seed=5)
    r = device_put_complex(np.asarray(rhs), split=mg._split).astype_real(
        jnp.float32)

    # externally verified f32 residual of z: || r - D z || / || r ||
    lvl = mg._levels()[0]

    @jax.jit
    def ext_rel(s, r_log, z_log):
        v = s.from_logical(z_log)
        w = s.to_logical(s.full_op(v))
        return jnp.sqrt(cplx.norm2(r_log - w) / cplx.norm2(r_log))

    for target in (1e-2, 1e-3, 1e-4, 1e-5, 1e-6):
        z, it, cit = mg.inner_restart(r, target, m=50)
        itv = float(host_float(it))
        rel = float(host_float(ext_rel(lvl.stencil, r, z)))
        print(f"target {target:.0e}: iters {itv:4.0f}  "
              f"verified f32 relres {rel:.3e}  "
              f"({'OK' if rel <= 3 * target else 'SHORT'})", flush=True)


if __name__ == "__main__":
    main()
