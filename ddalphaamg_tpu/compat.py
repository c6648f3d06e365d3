"""Drop-in-shaped embedding API mirroring the reference C library surface
(src/dd_alpha_amg.h:29-90, dd_alpha_amg_parameters.h, dd_alpha_amg_setup_status.h):

    from ddalphaamg_tpu import compat as amg
    par = amg.dd_alpha_amg_par(param_file_path="sample.ini", m0=-0.5, csw=1.0)
    amg.dd_alpha_amg_init(par)
    plaq = amg.dd_alpha_amg_set_conf(U)         # U [4,T,Z,Y,X,3,3]
    amg.dd_alpha_amg_setup(iterations=4)
    x, relres, status = amg.dd_alpha_amg_wilson_solve(b, tol=1e-10)
    amg.dd_alpha_amg_free()

Reference features that have no TPU meaning are documented here instead of
stubbed with surprises:
  * external-threading variants: XLA owns intra-chip parallelism; the plain
    entry points are the equivalents.
  * conf_index_fct/vector_index_fct user-layout callbacks: pass arrays in
    the documented dense layouts (numpy views/transposes are cheap); the
    `bc` field replaces the boundary handling the callbacks fed.
  * get_gauge_pointer/get_clover_pointer: arrays are immutable on device;
    use dd_alpha_amg_set_conf + dd_alpha_amg_fields_updated.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from . import api
from .config import DepthParams, SolverParams, parse_ini

MAX_MG_LEVELS = 4

_BC_DIRICHLET, _BC_PERIODIC, _BC_ANTI_PERIODIC = 0, 1, 2


@dataclasses.dataclass
class dd_alpha_amg_parameters:
    """Mirror of dd_alpha_amg_parameters.h:26-51."""
    number_of_levels: int = 2
    global_lattice: Optional[list] = None        # [level][4]
    block_lattice: Optional[list] = None
    mg_basis_vectors: Optional[list] = None      # per level
    setup_iterations: Optional[list] = None
    discard_setup_after: int = 10**9
    update_setup_iterations: Optional[list] = None
    update_setup_after: int = 10**9
    post_smooth_iterations: Optional[list] = None
    post_smooth_block_iterations: Optional[list] = None
    coarse_grid_iterations: int = 100
    coarse_grid_maximum_number_of_restarts: int = 5
    coarse_grid_tolerance: float = 5e-2
    # None = inherit from the param file (see dd_alpha_amg_par note)
    solver_mass: Optional[float] = None
    setup_mass: Optional[float] = None
    c_sw: Optional[float] = None


@dataclasses.dataclass
class dd_alpha_amg_par:
    """Mirror of the init struct (src/dd_alpha_amg.h:29-39)."""
    param_file_path: str = ""
    bc: int = _BC_ANTI_PERIODIC
    # None = inherit from the param file; set explicitly to override
    # (the reference struct has no "unset" state, but defaulting to concrete
    # values here would silently clobber ini-file m0/csw)
    m0: Optional[float] = None
    csw: Optional[float] = None
    setup_m0: Optional[float] = None
    amg_params: Optional[dd_alpha_amg_parameters] = None


@dataclasses.dataclass
class dd_alpha_amg_setup_status:
    """Mirror of dd_alpha_amg_setup_status.h:25-28."""
    gauge_updates_since_last_setup: int = 10**9
    gauge_updates_since_last_setup_update: int = 10**9


_solver: Optional[api.Solver] = None
_par: Optional[dd_alpha_amg_par] = None
_status = dd_alpha_amg_setup_status()
_mass_for_next_solve: Optional[float] = None


def _params_from(par: dd_alpha_amg_par) -> SolverParams:
    if par.param_file_path:
        p = parse_ini(par.param_file_path)
    else:
        p = SolverParams()
        p.depth = []
    a = par.amg_params
    if a is not None:
        p.num_levels = a.number_of_levels
        while len(p.depth) < p.num_levels:
            p.depth.append(DepthParams())
        for i in range(p.num_levels):
            d = p.depth[i]
            if a.global_lattice:
                d.global_lattice = tuple(a.global_lattice[i])
            if a.block_lattice:
                d.block_lattice = tuple(a.block_lattice[i])
            if a.mg_basis_vectors:
                d.test_vectors = a.mg_basis_vectors[i]
            if a.setup_iterations:
                d.setup_iter = a.setup_iterations[i]
            if a.post_smooth_iterations:
                d.post_smooth_iter = a.post_smooth_iterations[i]
            if a.post_smooth_block_iterations:
                d.block_iter = a.post_smooth_block_iterations[i]
        p.coarse_iter = a.coarse_grid_iterations
        p.coarse_restart = a.coarse_grid_maximum_number_of_restarts
        p.coarse_tol = a.coarse_grid_tolerance
        if a.solver_mass is not None:
            p.m0 = a.solver_mass
        if a.c_sw is not None:
            p.csw = a.c_sw
    p.m0 = par.m0 if par.m0 is not None else p.m0
    p.csw = par.csw if par.csw is not None else p.csw
    p.anti_pbc = par.bc == _BC_ANTI_PERIODIC
    p.bc = par.bc
    return p.validate()


def dd_alpha_amg_init(par: dd_alpha_amg_par) -> None:
    global _solver, _par
    _par = par
    _solver = api.Solver(_params_from(par))


def dd_alpha_amg_update_parameters(amg_params: dd_alpha_amg_parameters) -> None:
    """Live parameter update (reference src/init.c:1139-1182); requires
    re-setup to take effect, as in the reference."""
    assert _par is not None, "call dd_alpha_amg_init first"
    _par.amg_params = amg_params
    _solver.p = _params_from(_par)


def dd_alpha_amg_set_conf(gauge_field) -> float:
    """Store links (row-major SU(3), [4,T,Z,Y,X,3,3]); returns plaquette."""
    assert _solver is not None, "call dd_alpha_amg_init first"
    plaq = _solver.set_conf(np.asarray(gauge_field))
    dd_alpha_amg_fields_updated()
    return plaq


def dd_alpha_amg_fields_updated() -> None:
    """Gauge/clover changed externally: bump staleness counters
    (src/dd_alpha_amg.h:51-59)."""
    _status.gauge_updates_since_last_setup += 1
    _status.gauge_updates_since_last_setup_update += 1


def dd_alpha_amg_setup(iterations: Optional[int] = None) -> dict:
    assert _solver is not None
    if iterations is not None:
        for d in _solver.p.depth:
            d.setup_iter = iterations
    # setup mass: build the hierarchy at setup_m0/setup_mass, solve at m0
    # (reference g.setup_m0, src/dd_alpha_amg.c:258-321): the preconditioner
    # keeps the setup-mass hierarchy while the outer operator carries the
    # solve mass.
    a = _par.amg_params if _par is not None else None
    sm = None
    if _par is not None and _par.setup_m0 is not None:
        sm = _par.setup_m0
    elif a is not None and a.setup_mass is not None:
        sm = a.setup_mass
    if sm is not None and sm != _solver.p.m0 and _solver.op is not None:
        from .operators.wilson import shift_diagonal
        solve_op = _solver.op
        _solver.op = shift_diagonal(solve_op, sm - _solver.p.m0)
        _solver.setup()
        _solver.op = solve_op
    else:
        _solver.setup()
    _status.gauge_updates_since_last_setup = 0
    _status.gauge_updates_since_last_setup_update = 0
    return {"setup_time": _solver.status.setup_time}


def dd_alpha_amg_setup_update(iterations: int = 1) -> dict:
    assert _solver is not None
    _solver.update_setup(iterations)
    _status.gauge_updates_since_last_setup_update = 0
    return {"setup_time": _solver.status.setup_time}


def run_dd_alpha_amg_setup_if_necessary() -> None:
    """Staleness-counter driven re-setup (src/dd_alpha_amg.c:85-93): full
    setup after discard_setup_after gauge updates, cheap setup_update after
    update_setup_after, and a shift_update when the next solve mass moved."""
    assert _solver is not None and _par is not None
    a = _par.amg_params or dd_alpha_amg_parameters()
    if _status.gauge_updates_since_last_setup >= a.discard_setup_after:
        dd_alpha_amg_setup()
    elif _status.gauge_updates_since_last_setup_update >= a.update_setup_after:
        dd_alpha_amg_setup_update()
    global _mass_for_next_solve
    if _mass_for_next_solve is not None and _mass_for_next_solve != _solver.p.m0:
        _solver.shift_update(_mass_for_next_solve)
        _mass_for_next_solve = None


def dd_alpha_amg_set_mass_for_next_solve(m0: float) -> None:
    global _mass_for_next_solve
    _mass_for_next_solve = m0


def _scaled_clover(scale_even: float, scale_odd: float):
    """Temporarily scale even/odd-site clover blocks (reference scale_clover,
    src/dirac.c:646-668).  Returns a context manager."""
    import contextlib

    import jax.numpy as jnp

    from .operators.wilson import WilsonOperator

    @contextlib.contextmanager
    def ctx():
        if scale_even == 1.0 and scale_odd == 1.0:
            yield
            return
        op = _solver.op
        lat = op.lattice
        coords = np.indices(lat).sum(axis=0) % 2
        factor = np.where(coords == 0, scale_even, scale_odd)
        f = jnp.asarray(factor[..., None, None, None],
                        dtype=op.clover.re.dtype if hasattr(op.clover, "re")
                        else op.clover.real.dtype)
        saved = op
        _solver.op = WilsonOperator(op.links, op.clover * f)
        try:
            yield
        finally:
            _solver.op = saved

    return ctx()


def dd_alpha_amg_wilson_solve(vector_in, tol: float = 1e-10,
                              scale_even: float = 1.0,
                              scale_odd: float = 1.0):
    """Returns (vector_out, relres, status dict) -- reference
    dd_alpha_amg_wilson_solve (src/dd_alpha_amg.c:324)."""
    assert _solver is not None
    run_dd_alpha_amg_setup_if_necessary()
    with _scaled_clover(scale_even, scale_odd):
        x, info = _solver.solve(np.asarray(vector_in), tol=tol)
    status = {"iterations": info.iterations,
              "coarse_iterations": info.coarse_average * max(1, info.iterations)}
    return x, info.relres, status


def dd_alpha_amg_preconditioner(vector_in, scale_even: float = 1.0,
                                scale_odd: float = 1.0):
    assert _solver is not None
    with _scaled_clover(scale_even, scale_odd):
        return np.asarray(_solver.apply_preconditioner(np.asarray(vector_in)))


def dd_alpha_amg_free() -> None:
    global _solver, _par, _mass_for_next_solve
    _solver = None
    _par = None
    _mass_for_next_solve = None
    _status.gauge_updates_since_last_setup = 10**9
    _status.gauge_updates_since_last_setup_update = 10**9
