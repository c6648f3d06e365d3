#!/usr/bin/env python
"""Convergence-parity probe on the rough16 headline problem at the
reference's EXACT parameters (bench_assets/rough16.ini: 28 TVs at d0 and
d1, setup_iter 4+3, block 2^4, post-smooth 2, block_iter 4, tol 1e-10,
rhs=ones).  Reference result on this config: 11 outer iterations,
coarse_average 72.55 (bench_assets/rough16_ref.json).

Knobs (env):
  PROBE_TV0 / PROBE_TV1     test vectors at depth 0 / 1 (default 28/28)
  PROBE_SETUP0 / PROBE_SETUP1  setup iters (default 4/3)
  PROBE_LAT                 lattice (default 16,16,16,16)
  PROBE_RESVEC=1            print the outer residual history
"""
import os
import sys
import time

os.environ.setdefault("DDAAMG_NO_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench
    from ddalphaamg_tpu import api, config

    lat = tuple(int(e) for e in os.environ.get(
        "PROBE_LAT", "16,16,16,16").split(","))
    tv0 = int(os.environ.get("PROBE_TV0", "28"))
    tv1 = int(os.environ.get("PROBE_TV1", "28"))
    si0 = int(os.environ.get("PROBE_SETUP0", "4"))
    si1 = int(os.environ.get("PROBE_SETUP1", "3"))

    p = config.SolverParams(num_levels=3, tol=1e-10,
                            restart_length=50, max_restarts=20,
                            right_hand_side="ones", seed=5)
    p.depth = [config.DepthParams(global_lattice=lat,
                                  block_lattice=(2, 2, 2, 2),
                                  test_vectors=tv0, setup_iter=si0,
                                  post_smooth_iter=2, block_iter=4),
               config.DepthParams(global_lattice=tuple(e // 2 for e in lat),
                                  block_lattice=(2, 2, 2, 2),
                                  test_vectors=tv1, setup_iter=si1,
                                  post_smooth_iter=2, block_iter=4)]
    solver = api.Solver(p)
    U, plaq = bench._rough_gauge()
    t0 = time.perf_counter()
    solver.set_conf(U, links_have_bc=True)
    print(f"set_conf: {time.perf_counter()-t0:.1f}s plaq={plaq}", flush=True)
    t0 = time.perf_counter()
    solver.setup()
    print(f"setup[tv={tv0}/{tv1} si={si0}/{si1}]: "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    rhs = config.make_rhs("ones", solver.lattice, seed=5)
    t0 = time.perf_counter()
    x, info = solver.solve(rhs)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    x, info = solver.solve(rhs)
    warm = time.perf_counter() - t0
    exact = solver.true_residual(x, rhs)
    print(f"RESULT tv={tv0}/{tv1} si={si0}/{si1}: iters={info.iterations} "
          f"coarse_avg={info.coarse_average:.1f} relres={exact:.3e} "
          f"cold={cold:.1f}s warm={warm:.2f}s converged={info.converged} "
          f"(reference: 11 iters)", flush=True)


if __name__ == "__main__":
    main()
