"""Runtime diagnostics (the reference's DEBUG-build test_routine analog)."""

import pytest

from ddalphaamg_tpu import analysis, api, config

INI = """
d0 global lattice: 4 4 4 4
d0 block lattice: 2 2 2 2
d0 test vectors: 6
d0 setup iter: 1
number of levels: 2
method: 2
interpolation: 2
"""


@pytest.fixture(scope="module")
def solver(conf4):
    p = config.parse_ini(INI)
    p.configuration = conf4
    s = api.Solver(p)
    s.read_conf()
    s.setup()
    return s


def test_self_checks(solver):
    checks = analysis.run_self_checks(solver.mg)
    assert checks, "no checks ran"
    for name, res in checks.items():
        assert res < 5e-6, (name, res)  # f32 hierarchy => f32 epsilon scale


def test_test_vector_analysis(solver):
    rows = analysis.test_vector_analysis(solver.mg)
    assert len(rows) == 6
    for rho, res in rows:
        # bootstrap pushes tvs toward low modes: residual well below ||D||
        assert res < 2.0 and abs(rho) < 10.0


def test_smoother_and_coarse_reduction(solver):
    assert analysis.smoother_reduction(solver) < 0.9
    assert analysis.coarse_reduction(solver.mg) < 2 * solver.p.coarse_tol
