#!/usr/bin/env python
"""Headline benchmarks on one chip:
  1. Wilson-clover Dslash throughput (fused Pallas kernel)
  2. End-to-end multigrid solve to relative residual 1e-10 on a 16^4
     lattice (production api.Solver path: bootstrap setup + device-restart
     outer loop with the double-float true residual)

Prints ONE JSON line:
  {"metric": "dslash_gflops", "value": N, "unit": "GFLOP/s",
   "vs_baseline": R, "detail": {... incl. mg_solve_seconds ...}}

Flop model: reference analytic counts (1920 flop/site = 552 clover + 1368
hopping, src/init_generic.c:58-60).  vs_baseline is measured GFLOP/s over
the BASELINE.md target of 70% of the single-chip HBM roofline, with the
roofline computed from the *measured* streaming bandwidth AND the bytes the
kernel actually touches (packed 42-real-entry clover storage,
src/operator_generic.c:84-90):
  packed bytes/site = 288 (links) + 288 (packed clover) + 192 (in+out) = 768
The dense-clover model (1056 B/site) is reported alongside for reference.

The solve benchmark mirrors the reference's per-solve summary
(src/linsolve_generic.c:363-374): setup time, solve wall time, iterations,
coarse-iteration average, true (double-float-verified) relative residual,
and an estimated coarse-time fraction.  Reference comparison point: 6.43 s
for the 8^4 3-level sample.ini solve on one CPU core
(tests/ground_truth/8x8_3lvl_sample.log); 16^4 has 16x the sites.

Timing notes for this environment: the device relay can complete
block_until_ready without the computation having run, so every timed
region ends with a scalar *value fetch* (float(...)), which forces a real
device roundtrip; the fixed roundtrip cost is measured and subtracted.
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
CHAIN = 1200
BYTES_PER_SITE_DENSE = 4 * 9 * 8 + 2 * 36 * 8 + 2 * 12 * 8    # 1056
BYTES_PER_SITE_PACKED = 4 * 9 * 8 + (2 * 6 * 4 + 2 * 15 * 8) + 2 * 12 * 8  # 768
FLOPS_PER_SITE = 1920

SOLVE_LAT = tuple(int(e) for e in os.environ.get(
    "DDAAMG_BENCH_LAT", "16,16,16,16").split(","))
SOLVE_TOL = 1e-10


def _timed_fetch(fn, *args):
    """Run jitted fn, synchronize by fetching its scalar value."""
    t0 = time.perf_counter()
    val = float(fn(*args))
    return time.perf_counter() - t0, val


def measure_roundtrip(x):
    """Fixed cost of dispatch + scalar fetch on this relay."""
    @jax.jit
    def tiny(v):
        return jnp.sum(v[:8])
    _timed_fetch(tiny, x)  # warmup compile
    return min(_timed_fetch(tiny, x)[0] for _ in range(5))


def measure_stream_bw():
    """Measured streaming HBM bandwidth (GB/s): x *= b elementwise chain."""
    n = 256 * 1024 * 1024 // 4
    iters = 16
    b = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32) * 1e-7 + 1.0

    @jax.jit
    def f(a, b):
        return jnp.sum(jax.lax.fori_loop(0, iters, lambda i, x: x * b, a)[:8])

    a0 = jax.random.normal(jax.random.PRNGKey(2), (n,), jnp.float32)
    _timed_fetch(f, a0, b)  # warmup compile
    rt = measure_roundtrip(a0)
    best = float("inf")
    for trial in range(3):
        a = jax.random.normal(jax.random.PRNGKey(3 + trial), (n,), jnp.float32)
        dt, _ = _timed_fetch(f, a, b)
        best = min(best, max(dt - rt, 1e-9))
    return 3 * (n * 4) * iters / best / 1e9


def bench_dslash():
    from ddalphaamg_tpu import cplx, gauge
    from ddalphaamg_tpu.operators import fast, pallas_dslash, wilson

    platform = jax.devices()[0].platform
    interpret = platform != "tpu"

    U = gauge.random_gauge_split(LAT, seed=0)
    op = wilson.WilsonOperator.from_gauge(U, m0=-0.5, csw=1.0)
    links = fast.links_to_soa(op.links).astype_real(jnp.float32)
    clov = fast.clover_to_soa(op.clover).astype_real(jnp.float32)
    cdiag, coff = pallas_dslash.pack_clover(clov)
    dslash = pallas_dslash.build_dslash(LAT, interpret=interpret)

    soa_shape = (4, 3, LAT[0], LAT[1], LAT[2] * LAT[3])

    def rand_phi(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return cplx.CArray(jax.random.normal(k1, soa_shape, dtype=jnp.float32),
                           jax.random.normal(k2, soa_shape, dtype=jnp.float32))

    @jax.jit
    def chain(l, cd, co, v):
        def body(i, x):
            return dslash(l, cd, co, x) * jax.lax.rsqrt(cplx.norm2(x))
        return cplx.norm2(jax.lax.fori_loop(0, CHAIN, body, v))

    _timed_fetch(chain, links, cdiag, coff, rand_phi(100))  # warmup compile
    rt = measure_roundtrip(rand_phi(100).re)

    best = float("inf")
    for trial in range(3):
        phi = rand_phi(101 + trial)
        dt, val = _timed_fetch(chain, links, cdiag, coff, phi)
        print(f"# chain trial {trial}: {dt * 1e3:.2f} ms (roundtrip "
              f"{rt * 1e3:.2f} ms), norm {val:.4e}", file=sys.stderr)
        best = min(best, max(dt - rt, 1e-9))
    ms = best * 1e3 / CHAIN

    sites = int(np.prod(LAT))
    gflops = FLOPS_PER_SITE * sites / (ms * 1e-3) / 1e9

    bw = measure_stream_bw()
    roofline_packed = bw * FLOPS_PER_SITE / BYTES_PER_SITE_PACKED
    roofline_dense = bw * FLOPS_PER_SITE / BYTES_PER_SITE_DENSE
    target = 0.7 * roofline_packed
    return {
        "gflops": gflops,
        "vs_target": gflops / target,
        "platform": platform,
        "ms_per_apply": ms,
        "measured_stream_gbs": bw,
        "roofline_gflops_packed": roofline_packed,
        "roofline_gflops_dense": roofline_dense,
        "target_gflops": target,
    }


def smooth_su3(lattice, seed=0, eps=0.25):
    """Near-free SU(3) configuration (host, complex128): QR-project
    I + eps*Gaussian.  Smooth enough that m0=-0.5 is well conditioned,
    reproducible by seed."""
    rng = np.random.default_rng(seed)
    shape = (4, *lattice, 3, 3)
    g = np.eye(3) + eps * (rng.normal(size=shape) + 1j * rng.normal(size=shape))
    q, r = np.linalg.qr(g)
    d = np.einsum("...ii->...i", r)
    q = q * np.conj(d / np.abs(d))[..., None, :]
    det = np.linalg.det(q)
    return q * np.conj(det ** (1.0 / 3.0))[..., None, None]


def _solver_params(rhs_kind: str, tv=(16, 16), setup=(3, 3),
                   lat=None):
    from ddalphaamg_tpu import config
    lat = lat or SOLVE_LAT
    p = config.SolverParams(num_levels=3, tol=SOLVE_TOL,
                            restart_length=50, max_restarts=20,
                            right_hand_side=rhs_kind, seed=5)
    p.depth = [config.DepthParams(global_lattice=lat,
                                  block_lattice=(2, 2, 2, 2),
                                  test_vectors=tv[0], setup_iter=setup[0],
                                  post_smooth_iter=2, block_iter=4),
               config.DepthParams(
                   global_lattice=tuple(e // 2 for e in lat),
                   block_lattice=(2, 2, 2, 2),
                   test_vectors=tv[1], setup_iter=setup[1],
                   post_smooth_iter=2, block_iter=4)]
    return p


ROUGH_CONF = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_assets", "rough16.cnfg")
ROUGH_REF_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_assets", "rough16_ref.json")


def _rough_gauge():
    """Reference-roughness gauge field for SOLVE_LAT: the committed
    plaquette-targeted config (the exact field the reference binary was
    benchmarked on -> same-problem comparison) when the lattice matches,
    else generated on the fly (deterministic in lattice/seed)."""
    from ddalphaamg_tpu import io as dio
    from ddalphaamg_tpu import tools
    if SOLVE_LAT == (16, 16, 16, 16) and os.path.exists(ROUGH_CONF):
        U, plaq = dio.read_gauge_field(ROUGH_CONF, anti_periodic=True)
        return U, plaq
    U = tools.rough_su3(SOLVE_LAT, seed=0).copy()
    U[0, -1] *= -1.0  # anti-periodic in time, like the reference run
    return U, None


def bench_mg_solve(kind: str = "smooth", tv=(16, 16), setup=(3, 3),
                   measure_setup_run: bool = False, do_cold: bool = True,
                   do_multi: bool = True, progress=None):
    """Production end-to-end solve: setup + solve to 1e-10 on SOLVE_LAT.

    kind="smooth": near-free synthetic field (the flattering problem; kept
    for round-over-round continuity -> mg_vs_ref_scaled).
    kind="rough": plaquette-matched beta=6.0-roughness config; compared
    like-for-like against the reference binary's recorded run on the SAME
    config/lattice (bench_assets/rough16_ref.json -> mg_vs_ref_same_problem).
    The HEADLINE rough run uses the reference's exact parameters
    (28/28 test vectors, setup_iter 4+3, bench_assets/rough16.ini) so
    mg_iterations and mg_vs_ref_same_problem compare matched solvers; the
    16-TV variant is reported separately as mg_fast_* (cheaper setup, more
    iterations -- a parameter choice, labeled as such).

    measure_setup_run: run a SECOND full setup in-process (all jit caches
    warm -> pure device work) to split setup wall time into measured
    compile vs run parts (r3's event-listener split double-counted nested
    traces and reported compile > wall).
    """
    from ddalphaamg_tpu import api, config
    from ddalphaamg_tpu.profiling import compile_time_tracker

    rhs_kind = "ones" if kind == "rough" else "random"
    p = _solver_params(rhs_kind, tv=tv, setup=setup)
    solver = api.Solver(p)
    if kind == "rough":
        U, _plaq = _rough_gauge()
    else:
        U = smooth_su3(SOLVE_LAT, seed=0)
    solver.set_conf(U, links_have_bc=True)

    progress = progress or (lambda d: None)
    # liveness partial BEFORE the heavyweight setup: a cold compile cache
    # makes the 28-TV setup's F-cycle program take >15 min of XLA compile
    # (observed: the r5 first cold run died at the section watchdog with
    # zero evidence); this record marks how far the section got and whether
    # the cache was warm when it tried.
    cache_dir = os.path.expanduser("~/.cache/ddalphaamg_tpu/xla")
    try:
        cache_entries = len(os.listdir(cache_dir))
    except OSError:
        cache_entries = 0
    progress({"mg_test_vectors": list(tv), "mg_setup_iter": list(setup),
              "mg_compile_cache_entries_at_start": cache_entries,
              "mg_phase_reached": "setup"})
    t0 = time.perf_counter()
    with compile_time_tracker() as comp:
        solver.setup()
    setup_s = time.perf_counter() - t0
    progress({"mg_setup_seconds": round(setup_s, 1),
              "mg_test_vectors": list(tv), "mg_setup_iter": list(setup),
              "mg_phase_reached": "solve"})

    setup_run_s = None
    if measure_setup_run:
        # second setup, same shapes: every jit cache hits -> pure run
        solver2 = api.Solver(p)
        solver2.set_conf(U, links_have_bc=True)
        t0 = time.perf_counter()
        solver2.setup()
        setup_run_s = time.perf_counter() - t0
        del solver2

    rhs = config.make_rhs(rhs_kind, SOLVE_LAT, seed=5)
    cold_s = None
    solve_comp = {"compile_s": 0.0}
    if do_cold:
        with compile_time_tracker() as solve_comp:
            x, info = solver.solve(rhs)   # cold (includes outer compiles)
        cold_s = info.solve_time
    x, info = solver.solve(rhs)           # warm
    exact = solver.true_residual(x, rhs)
    print(f"# mg_solve[{kind} tv={tv} setup={setup}]: setup {setup_s:.1f}s "
          f"(run {setup_run_s if setup_run_s is None else round(setup_run_s, 1)}s) "
          f"cold {cold_s if cold_s is None else round(cold_s, 1)}s warm "
          f"{info.solve_time:.2f}s iters {info.iterations} "
          f"exact relres {exact:.2e}", file=sys.stderr)

    # coarse-time fraction estimate: whole traced cycle vs depth-0 pieces
    # (headline problem only -- the timings are gauge-independent)
    coarse_frac = None
    extra_times = {}
    try:
        if not do_multi:
            raise RuntimeError("skipped (headline run reports cycle timings)")
        import jax as _jax
        from ddalphaamg_tpu.smoothers.sap import sap_smooth_from
        from ddalphaamg_tpu.utils import device_put_complex
        mg = solver.mg
        lvl = mg._levels()[0]
        eta_log = device_put_complex(np.asarray(rhs))

        def timeit(fn, *args, n=3):
            out = fn(*args)
            _jax.block_until_ready(out)
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                out = fn(*args)
                _jax.block_until_ready(out)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_cycle = timeit(lambda v: mg._run_cycle(v)[0], eta_log)
        v0 = lvl.stencil.from_logical(
            device_put_complex(np.asarray(rhs), split=mg._split))
        sm = lvl.smoother
        t_sm = timeit(lambda v: sap_smooth_from(
            sm.s, sm.colors, v, v, lvl.cfg.post_smooth_iter,
            sm.block_iter, sm.odd_even), v0)
        t_op = timeit(_jax.jit(lvl.stencil.full_op), v0)
        # subtract the fixed dispatch roundtrip from each measurement --
        # on the relay it (~25 ms) dwarfs the in-device times
        import jax.numpy as _jnp
        tiny = _jax.jit(lambda v: v.re[:1, :1, :1] if hasattr(v, "re") else v)
        rt = timeit(lambda v: tiny(v), v0)
        cyc, smo, op = (max(t - rt, 1e-6) for t in (t_cycle, t_sm, t_op))
        fine_t = lvl.cfg.n_cy * (smo + 2 * op)
        coarse_frac = max(0.0, min(1.0, (cyc - fine_t) / cyc))
        extra_times = {"cycle_ms": round(cyc * 1e3, 2),
                       "smoother_ms": round(smo * 1e3, 2),
                       "fine_op_ms": round(op * 1e3, 2),
                       "dispatch_ms": round(rt * 1e3, 2)}
    except Exception as e:
        extra_times = {}
        print(f"# coarse-fraction estimate failed: {e}", file=sys.stderr)

    out = {
        "mg_phase_reached": "done",
        "mg_solve_seconds": round(info.solve_time, 3),
        "mg_setup_seconds": round(setup_s, 1),
        "mg_test_vectors": list(tv),
        "mg_setup_iter": list(setup),
        "mg_iterations": info.iterations,
        "mg_coarse_average": round(info.coarse_average, 2),
        # coarsest operator applications / outer iteration: comparable with
        # the reference's coarse-grid-iteration average regardless of
        # coarsest_direct (inverse applies counted separately)
        "mg_coarse_matvec_average": round(info.coarse_matvec_average, 2),
        "mg_coarsest_inverse_applies": round(info.coarsest_inverse_applies, 1),
        # with the dense coarsest inverse a "coarse solve" is ONE matvec,
        # so coarse_average is not comparable to the reference's GCR
        # iteration average -- the solver kind is recorded alongside
        "mg_coarsest_solver": ("direct" if solver.mg is not None
                               and solver.mg.cfg.coarsest_direct else "gcr"),
        "mg_exact_relres": float(f"{exact:.3e}"),
        "mg_converged": bool(info.converged and exact < 2 * SOLVE_TOL),
        "mg_lattice": list(SOLVE_LAT),
        "mg_levels": p.num_levels,
        "mg_memory_mb": round(info.memory_mb, 1),
        "mg_inner_restart_cap": info.inner_restart_cap,
        # f32 inner-sweep tolerance clip the adaptive scheme settled on
        # (config.SolverParams.inner_tol_clip; 0 = non-df path)
        "mg_inner_clip": float(f"{info.inner_tol_clip:.2e}"),
    }
    if cold_s is not None:
        out["mg_solve_cold_seconds"] = round(cold_s, 3)
        out["mg_solve_cold_compile_seconds"] = round(solve_comp["compile_s"], 1)
    if setup_run_s is not None:
        # measured split: 2nd-setup wall = pure run; 1st - 2nd = compile
        # (trace+lower+backend).  The event-listener total is reported as
        # informational only (it double-counts nested jit traces).
        out["mg_setup_run_seconds"] = round(setup_run_s, 1)
        out["mg_setup_compile_seconds"] = round(
            max(setup_s - setup_run_s, 0.0), 1)
        out["mg_setup_compile_events_seconds"] = round(comp["compile_s"], 1)
    # incremental: the core solve record survives a later watchdog kill
    # (multi-RHS / 32^4 sections may still be minutes away)
    progress(dict(out))
    sites = int(np.prod(SOLVE_LAT))
    if kind == "smooth":
        ref_sites = 8 ** 4
        ref_solve_s = 6.43  # reference 8^4 3-level, 1 CPU core (ground truth)
        scaled_ref = ref_solve_s * sites / ref_sites
        out["ref_scaled_solve_seconds"] = round(scaled_ref, 1)
        out["mg_vs_ref_scaled"] = round(
            scaled_ref / max(info.solve_time, 1e-9), 2)
    else:
        # like-for-like: the reference binary's recorded run on the SAME
        # rough config + lattice + rhs, one CPU core on this machine
        # (bench_assets/rough16_ref.{log,json}, scripts/refbench)
        try:
            with open(ROUGH_REF_JSON) as f:
                ref = json.load(f)
            if tuple(ref.get("lattice", ())) == SOLVE_LAT:
                out["ref_same_problem_solve_seconds"] = ref["solve_seconds"]
                out["ref_same_problem_setup_seconds"] = ref.get("setup_seconds")
                out["ref_same_problem_iterations"] = ref.get("iterations")
                out["mg_vs_ref_same_problem"] = round(
                    ref["solve_seconds"] / max(info.solve_time, 1e-9), 2)
        except Exception as e:
            print(f"# same-problem reference record unavailable: {e}",
                  file=sys.stderr)
    if coarse_frac is not None:
        out["mg_coarse_time_fraction"] = round(coarse_frac, 3)
    out.update(extra_times)

    # batched multi-RHS throughput (DDAAMG_BENCH_MULTI=B, default 12, 0
    # disables): the vmapped device-restart path amortizes dispatch and
    # batches every cycle matmul; reports per-RHS seconds vs the
    # single-RHS warm solve.  Run once, on the rough (headline) problem.
    nb = int(os.environ.get("DDAAMG_BENCH_MULTI",
                            "12" if (kind == "rough" and do_multi) else "0"))
    if nb == 1:
        print("# DDAAMG_BENCH_MULTI must be >= 2 (got 1); skipping multi-RHS",
              file=sys.stderr)
    if nb > 1 and kind == "rough" and do_multi:
        try:
            rng = np.random.default_rng(9)
            bs = np.stack([rng.normal(size=(*SOLVE_LAT, 4, 3))
                           + 1j * rng.normal(size=(*SOLVE_LAT, 4, 3))
                           for _ in range(nb)])
            solver.solve_multi(bs, tol=SOLVE_TOL)      # compile
            t0 = time.perf_counter()
            _, minfos = solver.solve_multi(bs, tol=SOLVE_TOL)
            mt = time.perf_counter() - t0
            out["mg_multi_rhs"] = nb
            out["mg_multi_seconds_per_rhs"] = round(mt / nb, 3)
            out["mg_multi_speedup"] = round(
                info.solve_time * nb / max(mt, 1e-9), 2)
            out["mg_multi_converged"] = bool(all(i.converged for i in minfos))
            out["mg_multi_inner_restart_cap"] = minfos[0].inner_restart_cap
            out["mg_multi_iterations_mean"] = round(
                float(np.mean([i.iterations for i in minfos])), 1)
        except Exception as e:
            print(f"# multi-RHS bench failed: {e}", file=sys.stderr)
    return out


def bench_lat32():
    """32^4 single-chip production solve (BASELINE configs ladder step 5,
    single-chip leg): 16x the headline volume on one chip.  Parameters are
    memory-gated (8 test vectors, setup 2+2; the inner GCR basis is capped
    by DDAAMG_INNER_BASIS_BUDGET to ~11 at this volume) -- the point is a
    converged 1e-10 solve with recorded memory, not parameter parity.
    Gauge field: tools.rough_su3 (the same generator as the headline's
    committed config, deterministic in seed)."""
    from ddalphaamg_tpu import api, config, tools

    lat = (32, 32, 32, 32)
    # HBM at 32^4 is tight (hierarchy ~11 GB resident): cap the inner GCR
    # basis pair at ~6 vectors (1.2 GB) unless the caller overrides
    os.environ.setdefault("DDAAMG_INNER_BASIS_BUDGET", "80000000")
    p = _solver_params("ones", tv=(8, 8), setup=(2, 2), lat=lat)
    solver = api.Solver(p)
    U = tools.rough_su3(lat, seed=0).copy()
    U[0, -1] *= -1.0  # anti-periodic in time
    solver.set_conf(U, links_have_bc=True)
    t0 = time.perf_counter()
    solver.setup()
    setup_s = time.perf_counter() - t0
    _emit_partial({"lat32_setup_seconds": round(setup_s, 1)})
    # release setup-only arrays: at 32^4 the full hierarchy leaves no HBM
    # headroom for the solve workspace
    solver.slim_for_solve()
    rhs = config.make_rhs("ones", lat, seed=5)
    x, info = solver.solve(rhs)           # cold
    cold_s = info.solve_time
    x, info = solver.solve(rhs)           # warm
    exact = solver.true_residual(x, rhs)
    print(f"# mg_solve[32^4 tv=8 setup=2+2]: setup {setup_s:.1f}s cold "
          f"{cold_s:.1f}s warm {info.solve_time:.2f}s iters "
          f"{info.iterations} exact relres {exact:.2e} mem "
          f"{info.memory_mb:.0f} MB", file=sys.stderr)
    return {
        "lat32_solve_seconds": round(info.solve_time, 3),
        "lat32_solve_cold_seconds": round(cold_s, 3),
        "lat32_setup_seconds": round(setup_s, 1),
        "lat32_iterations": info.iterations,
        "lat32_exact_relres": float(f"{exact:.3e}"),
        "lat32_converged": bool(info.converged and exact < 2 * SOLVE_TOL),
        "lat32_memory_mb": round(info.memory_mb, 1),
        "lat32_test_vectors": 8,
        "lat32_inner_restart_cap": info.inner_restart_cap,
    }


# ---------------------------------------------------------------------------
# Orchestration: every heavyweight section runs in a SUBPROCESS under a hard
# per-section timeout, the parent enforces a global deadline, and the final
# JSON line prints NO MATTER WHAT any section does (OOM retrace, relay stall,
# crash).  r4 lesson: one OOM + a single end-of-run print turned the whole
# round into rc 124 / parsed: null -- zero certified numbers.  The reference
# treats benchmark reporting as a first-class subsystem
# (src/top_level.c:71-101); so does this file now.
#   DDAAMG_BENCH_BUDGET_S    global wall budget (default 2400)
#   DDAAMG_BENCH_SECTIONS    comma list to run (default all)
#   DDAAMG_BENCH_SIMULATE_STALL=<name>  make that section hang (watchdog test)
# ---------------------------------------------------------------------------

RESULT_TAG = "@@RESULT "

# (name, cap seconds, skip-env, minimum useful slice)
SECTION_PLAN = [
    ("dslash",   480, None, 120),
    ("headline", 1100, None, 300),
    ("fast",     640, "DDAAMG_BENCH_SKIP_FAST", 180),
    ("smooth",   640, "DDAAMG_BENCH_SKIP_SMOOTH", 180),
    ("lat32",    1100, "DDAAMG_BENCH_SKIP_32", 300),
]


def run_section(name: str) -> dict:
    """One section's measurements (runs inside the child process)."""
    if os.environ.get("DDAAMG_BENCH_SIMULATE_STALL") == name:
        time.sleep(100_000)   # watchdog test: pretend the relay wedged
    if name == "dslash":
        d = bench_dslash()
        return {
            "dslash_gflops": round(d["gflops"], 1),
            "dslash_vs_target": round(d["vs_target"], 3),
            "lattice": list(LAT),
            "kernel": "pallas-fused",
            "layout": "soa-split-f32",
            "platform": d["platform"],
            "ms_per_apply": round(d["ms_per_apply"], 4),
            "measured_stream_gbs": round(d["measured_stream_gbs"], 1),
            "roofline_gflops_packed": round(d["roofline_gflops_packed"], 1),
            "roofline_gflops_dense": round(d["roofline_gflops_dense"], 1),
            "target_gflops": round(d["target_gflops"], 1),
        }
    if name == "headline":
        # HEADLINE: reference-roughness config at the reference's EXACT
        # parameters (28/28 TVs, setup 4+3, bench_assets/rough16.ini) --
        # mg_iterations and mg_vs_ref_same_problem compare matched solvers
        # on the same matrix (reference recorded run: 11 iterations,
        # 85.9 s solve, bench_assets/rough16_ref.json)
        return bench_mg_solve("rough", tv=(28, 28), setup=(4, 3),
                              measure_setup_run=True, progress=_emit_partial)
    if name == "fast":
        # fast-setup variant (16 TVs, setup 3+3): the r1-r3 bench config,
        # labeled mg_fast_* -- cheaper setup at the cost of iterations (a
        # PARAMETER choice, not machine speed)
        fa = bench_mg_solve("rough", tv=(16, 16), setup=(3, 3),
                            do_cold=False, do_multi=False,
                            progress=lambda d: _emit_partial(
                                {f"mg_fast_{k.removeprefix('mg_')}": v
                                 for k, v in d.items()
                                 if not k.startswith("ref_")}))
        return {f"mg_fast_{k.removeprefix('mg_')}": v
                for k, v in fa.items() if not k.startswith("ref_")}
    if name == "smooth":
        # continuity problem: the smooth field r01/r02 benchmarked
        sm = bench_mg_solve("smooth", do_multi=False)
        keep = {"ref_scaled_solve_seconds", "mg_vs_ref_scaled"}
        return {k if k in keep else f"smooth_{k.removeprefix('mg_')}": v
                for k, v in sm.items()}
    if name == "lat32":
        return bench_lat32()
    raise ValueError(f"unknown section {name!r}")


def _emit_partial(d: dict) -> None:
    """Flush a partial section record: the parent merges EVERY tagged line
    (in order), so measurements taken before a watchdog kill survive."""
    print(RESULT_TAG + json.dumps(d), flush=True)


def _child_main(name: str) -> int:
    try:
        out = run_section(name)
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        out = {f"{name}_error": repr(e)[:300]}
    print(RESULT_TAG + json.dumps(out), flush=True)
    return 0


def _merge_tagged(stdout: str) -> dict:
    """Merge every @@RESULT line in order (later fields override)."""
    out = {}
    for line in (stdout or "").splitlines():
        if line.startswith(RESULT_TAG):
            try:
                out.update(json.loads(line[len(RESULT_TAG):]))
            except Exception:
                pass
    return out


def _run_section_subprocess(name: str, slice_s: float) -> dict:
    """Run one section as a watchdogged child; never raises."""
    import subprocess
    cmd = [sys.executable, os.path.abspath(__file__), "--section", name]
    t0 = time.perf_counter()
    try:
        r = subprocess.run(cmd, timeout=slice_s, capture_output=True,
                           text=True)
    except subprocess.TimeoutExpired as e:
        texts = []
        for s in (e.stderr or b""), (e.stdout or b""):
            texts.append(s.decode(errors="replace")
                         if isinstance(s, bytes) else s)
        if texts[0]:
            sys.stderr.write(texts[0][-4000:])
        # salvage any incremental records the child flushed before the kill
        out = _merge_tagged(texts[1])
        out[f"{name}_error"] = (f"timeout after {int(slice_s)}s (section "
                                "killed by watchdog"
                                + ("; partial results kept)" if out else ")"))
        return out
    dt = time.perf_counter() - t0
    if r.stderr:
        sys.stderr.write(r.stderr[-8000:])
    out = _merge_tagged(r.stdout)
    if not out:
        tail = ((r.stderr or "") + (r.stdout or ""))[-300:]
        out = {f"{name}_error": f"section crashed rc={r.returncode}: {tail}"}
    out[f"bench_{name}_wall_seconds"] = round(dt, 1)
    return out


def _probe_relay(timeout_s: int = 150):
    """Backend init latency via a SUBPROCESS (a dead relay hangs
    jax.devices() forever -- observed hours-long outages)."""
    import subprocess
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0, time.perf_counter() - t0
    except subprocess.TimeoutExpired:
        return False, time.perf_counter() - t0


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        return _child_main(sys.argv[2])

    budget = float(os.environ.get("DDAAMG_BENCH_BUDGET_S", "2400"))
    deadline = time.perf_counter() + budget
    detail = {"bench_budget_seconds": budget}

    ok, probe_s = _probe_relay()
    detail["relay_probe_seconds"] = round(probe_s, 1)
    if not ok:
        detail["error"] = ("device backend unreachable "
                           "(relay down / jax.devices() hang)")
        print(json.dumps({"metric": "dslash_gflops", "value": 0.0,
                          "unit": "GFLOP/s", "vs_baseline": 0.0,
                          "detail": detail}))
        return 0

    only = os.environ.get("DDAAMG_BENCH_SECTIONS")
    only = set(only.split(",")) if only else None
    if os.environ.get("DDAAMG_BENCH_DSLASH_ONLY"):
        only = {"dslash"}
    for name, cap, skip_env, min_s in SECTION_PLAN:
        if only is not None and name not in only:
            continue
        if skip_env and os.environ.get(skip_env):
            continue
        remaining = deadline - time.perf_counter() - 20  # final-print reserve
        if remaining < min_s:
            detail[f"{name}_skipped"] = ("budget exhausted "
                                         f"({int(remaining)}s left)")
            print(f"# section {name}: skipped (budget)", file=sys.stderr)
            continue
        slice_s = min(cap, remaining)
        print(f"# section {name}: starting (slice {int(slice_s)}s)",
              file=sys.stderr, flush=True)
        detail.update(_run_section_subprocess(name, slice_s))
        # incremental record: everything measured so far survives a later
        # kill -9 of the whole bench (driver reads stdout; the file is a
        # belt-and-braces copy)
        partial = {"metric": "dslash_gflops",
                   "value": detail.get("dslash_gflops", 0.0),
                   "unit": "GFLOP/s",
                   "vs_baseline": detail.get("dslash_vs_target", 0.0),
                   "detail": detail}
        try:
            with open("BENCH_partial.json", "w") as f:
                json.dump(partial, f)
        except OSError:
            pass
        print("# partial: " + json.dumps(partial), file=sys.stderr, flush=True)

    out = {
        "metric": "dslash_gflops",
        "value": detail.get("dslash_gflops", 0.0),
        "unit": "GFLOP/s",
        "vs_baseline": detail.get("dslash_vs_target", 0.0),
        "detail": detail,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
