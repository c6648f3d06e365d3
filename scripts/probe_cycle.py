#!/usr/bin/env python
"""Per-kernel-class timing of the benchmark's 3-level hierarchy on the
real chip (profiling.profile_hierarchy on the bench rough solver): what
eats the traced-cycle wall time (VERDICT r2: coarse fraction 0.48 ->
target < 0.30, cycle < 18 ms)."""
import os
import sys
import time

os.environ.setdefault("DDAAMG_NO_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    from ddalphaamg_tpu import api, config
    from ddalphaamg_tpu.profiling import profile_hierarchy

    tv = os.environ.get("PROBE_TV")
    si = os.environ.get("PROBE_SETUP")
    p = bench._solver_params("ones")
    if tv:
        for d in p.depth:
            d.test_vectors = int(tv)
    if si:
        for d in p.depth:
            d.setup_iter = int(si)
    solver = api.Solver(p)
    U, _ = bench._rough_gauge()
    t0 = time.perf_counter()
    solver.set_conf(U, links_have_bc=True)
    print(f"set_conf: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    solver.setup()
    print(f"setup: {time.perf_counter()-t0:.1f}s", flush=True)

    if os.environ.get("PROBE_SOLVE"):
        rhs = config.make_rhs("ones", solver.lattice, seed=5)
        x, info = solver.solve(rhs)
        x, info = solver.solve(rhs)
        print(f"solve: warm {info.solve_time:.2f}s iters {info.iterations} "
              f"exact {solver.true_residual(x, rhs):.2e}", flush=True)

    prof = profile_hierarchy(solver.mg, reps=10)
    print(prof.table(), flush=True)


if __name__ == "__main__":
    main()
