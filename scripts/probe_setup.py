#!/usr/bin/env python
"""Measure setup-phase costs on the real chip: compile vs run split.

Runs the bench's 16^4 3-level setup TWICE in one process (second build
reuses every jit cache entry -> pure compute), with per-phase profiling.
"""
import os
import sys
import time

os.environ.setdefault("DDAAMG_NO_X64", "1")

import numpy as np


def main():
    lat = tuple(int(e) for e in os.environ.get(
        "PROBE_LAT", "16,16,16,16").split(","))
    tv = int(os.environ.get("PROBE_TV", "16"))
    si = int(os.environ.get("PROBE_SETUP", "3"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ddalphaamg_tpu import api, config
    from ddalphaamg_tpu.profiling import PROF
    from bench import smooth_su3

    p = config.SolverParams(num_levels=3, tol=1e-10,
                            restart_length=50, max_restarts=20,
                            right_hand_side="random", seed=5)
    p.depth = [config.DepthParams(global_lattice=lat,
                                  block_lattice=(2, 2, 2, 2),
                                  test_vectors=tv, setup_iter=si,
                                  post_smooth_iter=2, block_iter=4),
               config.DepthParams(global_lattice=tuple(e // 2 for e in lat),
                                  block_lattice=(2, 2, 2, 2),
                                  test_vectors=tv, setup_iter=si,
                                  post_smooth_iter=2, block_iter=4)]
    solver = api.Solver(p)
    U = smooth_su3(lat, seed=0)
    t0 = time.perf_counter()
    solver.set_conf(U, links_have_bc=True)
    print(f"set_conf: {time.perf_counter()-t0:.1f}s", flush=True)

    PROF.enabled = True
    PROF.sync = True
    t0 = time.perf_counter()
    solver.setup()
    cold = time.perf_counter() - t0
    print(f"setup COLD: {cold:.1f}s", flush=True)
    for (depth, name), e in sorted(PROF.entries.items(),
                                   key=lambda kv: -kv[1].time):
        print(f"  d{depth} {name}: {e.time:.1f}s x{e.count}", flush=True)

    PROF.reset()
    t0 = time.perf_counter()
    solver.setup()
    warm = time.perf_counter() - t0
    print(f"setup WARM (jit caches hot): {warm:.1f}s  -> compile ~{cold-warm:.1f}s",
          flush=True)
    for (depth, name), e in sorted(PROF.entries.items(),
                                   key=lambda kv: -kv[1].time):
        print(f"  d{depth} {name}: {e.time:.1f}s x{e.count}", flush=True)


if __name__ == "__main__":
    main()
