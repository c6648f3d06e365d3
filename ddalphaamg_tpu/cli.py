"""Command-line driver (reference main.c / top_level.c analog):

    python -m ddalphaamg_tpu.cli <input.ini> [--platform cpu|tpu]

Reads a reference-format input file, builds the solver, runs the solve, and
prints a reference-style summary block.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU-native DD-alphaAMG solver")
    ap.add_argument("ini", help="input parameter file (reference format)")
    ap.add_argument("--platform", default=None, help="force a JAX platform (cpu/tpu)")
    ap.add_argument("--tol", type=float, default=None)
    ap.add_argument("--benchmark", type=int, default=0, metavar="N",
                    help="repeat the solve N times, report avg/min "
                         "(reference WILSON_BENCHMARK, src/top_level.c:71)")
    ap.add_argument("--profile", action="store_true",
                    help="print the per-kernel profiling table")
    ap.add_argument("--rhs-batch", type=int, default=0, metavar="B",
                    help="after the main solve, solve B random right-hand "
                         "sides via the batched multi-RHS driver "
                         "(Solver.solve_multi) and report per-RHS time")
    args = ap.parse_args(argv)

    if args.profile:
        from .profiling import PROF
        PROF.enabled = True

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
        if "cpu" in args.platform:
            # package import may have enabled the persistent compile cache
            # assuming the default TPU backend; never persist XLA:CPU
            # executables (machine-specific AOT code, SIGILL risk)
            jax.config.update("jax_compilation_cache_dir", None)

    from . import api, config

    params = config.parse_ini(args.ini)

    if params.evaluation:
        # parameter-scan mode (reference "evaluation: 1", src/var_table.c)
        from .evaluation import ScanConfig, run_scan
        sc = ScanConfig(
            scan_variable=params.scan_variable, start_val=params.start_val,
            end_val=params.end_val, step_size=params.step_size,
            multiplicative=params.multiplicative,
            shift_update=params.scan_shift_update,
            re_setup=params.scan_re_setup, track_error=params.track_error,
            track_cgn_error=params.track_cgn_error,
            average_over=params.average_over)
        run_scan(params, sc)
        return 0

    # process grid from the ini geometry (the reference's run script derives
    # np = prod(global/local lattice), run:69-100): a local lattice smaller
    # than the global one requests a device mesh of the quotient shape
    mesh = None
    d0 = params.depth[0]
    if d0.local_lattice:
        import numpy as _np

        import jax

        from . import parallel
        dims = tuple(g // l for g, l in zip(d0.global_lattice,
                                            d0.local_lattice))
        ndev = int(_np.prod(dims))
        if ndev > 1:
            if len(jax.devices()) >= ndev:
                mesh = parallel.make_solver_mesh(dims=dims)
                print(f"device mesh {dims} over {ndev} devices")
            else:
                print(f"| warning: ini requests a {dims} process grid "
                      f"({ndev} devices), only {len(jax.devices())} "
                      f"available -- running single-device |")
    solver = api.Solver(params, mesh=mesh)

    print(f"configuration: {params.configuration}")
    plaq, header = solver.read_conf()
    print(f"Desired average plaquette: {header:.13f} in [0,3]")
    print(f"Computed average plaquette: {plaq:.13f} in [0,3]")

    t0 = time.time()
    solver.setup()
    print(f"setup time: {time.time() - t0:.3f} seconds")

    rhs = config.make_rhs(params.right_hand_side, solver.lattice, seed=params.seed)
    x, info = solver.solve(rhs, tol=args.tol)

    if args.rhs_batch > 1:
        import numpy as _np
        rng = _np.random.default_rng(params.seed + 1)
        bs = _np.stack([rng.normal(size=(*solver.lattice, 4, 3))
                        + 1j * rng.normal(size=(*solver.lattice, 4, 3))
                        for _ in range(args.rhs_batch)])
        t0 = time.time()
        _, minfos = solver.solve_multi(bs, tol=args.tol)
        mt = time.time() - t0
        conv = sum(1 for i in minfos if i.converged)
        print(f"+- multi-RHS: {args.rhs_batch} solves (batched) "
              f"--------------------------+")
        print(f"|      per-RHS time: {mt / args.rhs_batch:9.4f} seconds "
              f"({conv}/{args.rhs_batch} converged) |")

    if args.benchmark > 0:
        # WILSON_BENCHMARK: repeat the solve, report avg/min
        times = [info.solve_time]
        for _ in range(args.benchmark - 1):
            _, inf2 = solver.solve(rhs, tol=args.tol)
            times.append(inf2.solve_time)
        print(f"+- benchmarking: {len(times)} solves "
              f"-------------------------------------+")
        print(f"|      avg solve time: {np.mean(times):9.4f} seconds        |")
        print(f"|      min solve time: {np.min(times):9.4f} seconds        |")

    # FGMRES_RESTEST analog: f64-accurate on CPU, double-float on TPU
    exact = solver.true_residual(x, np.asarray(rhs))
    print("+----------------------------------------------------------+")
    print(f"|       FGMRES iterations: {info.iterations:<6d} coarse average: {info.coarse_average:<6.2f}   |")
    print(f"| exact relative residual: ||r||/||b|| = {exact:e}      |")
    print(f"| elapsed wall clock time: {info.solve_time:<8.4f} seconds                |")
    if info.memory_mb:
        print(f"| maximal device memory/MPI process: {info.memory_mb:<8.1f} MB        |")
    print("+----------------------------------------------------------+")
    if args.profile:
        from .profiling import PROF
        print(PROF.table())
        if solver.mg is not None:
            # per-level kernel-class table (reference prof_print analog)
            from .profiling import profile_hierarchy
            print(profile_hierarchy(solver.mg).table())
    return 0 if info.converged else 1


if __name__ == "__main__":
    sys.exit(main())
