#!/usr/bin/env python
"""Per-restart residual trace of the production df outer loop on the
rough16 headline problem: prints each restart's pre-step relative
residual, the per-sweep reduction, the inner iterations spent, and the
clip the adaptive scheme applied.  Diagnoses sweep structure vs the
reference's 11-iteration run (PROBE_CLIP sets DDAAMG_INNER_CLIP)."""
import os
import sys
import time

os.environ.setdefault("DDAAMG_NO_X64", "1")
if os.environ.get("PROBE_CLIP"):
    os.environ["DDAAMG_INNER_CLIP"] = os.environ["PROBE_CLIP"]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench
    from ddalphaamg_tpu import api, config

    tv = (int(os.environ.get("PROBE_TV0", "28")),
          int(os.environ.get("PROBE_TV1", "28")))
    si = (int(os.environ.get("PROBE_SETUP0", "4")),
          int(os.environ.get("PROBE_SETUP1", "3")))
    p = bench._solver_params("ones", tv=tv, setup=si)
    solver = api.Solver(p)
    U, _ = bench._rough_gauge()
    solver.set_conf(U, links_have_bc=True)
    t0 = time.perf_counter()
    solver.setup()
    print(f"setup: {time.perf_counter()-t0:.1f}s", flush=True)

    rhs = config.make_rhs("ones", solver.lattice, seed=5)
    for trial in range(2):
        t0 = time.perf_counter()
        x, its, relres, conv, resvec = solver._solve_df_multi(
            np.asarray(rhs)[None], 1e-10)
        dt = time.perf_counter() - t0
        seq = [float(r[0]) for r in resvec]
        print(f"trial {trial}: iters={float(np.asarray(its).sum()):.0f} "
              f"final={float(relres[0]):.3e} conv={bool(conv[0])} "
              f"wall={dt:.2f}s clip={solver._last_inner_clip:.1e}")
        prev = 1.0
        for i, r in enumerate(seq):
            print(f"  restart {i}: rel={r:.3e}  sweep reduction {r/prev:.2e}")
            prev = max(r, 1e-300)
    # exact check
    exact = solver.true_residual(x[0], rhs)
    print(f"exact relres: {exact:.3e}")


if __name__ == "__main__":
    main()
