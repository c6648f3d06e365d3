"""Reference-shaped embedding API (compat module == dd_alpha_amg.h surface)."""

import numpy as np
import pytest

from ddalphaamg_tpu import compat as amg
from ddalphaamg_tpu import io as dio


@pytest.fixture()
def init4(conf4):
    par = amg.dd_alpha_amg_par(
        m0=-0.5, csw=1.0, bc=2,
        amg_params=amg.dd_alpha_amg_parameters(
            number_of_levels=2,
            global_lattice=[[4, 4, 4, 4], [2, 2, 2, 2]],
            block_lattice=[[2, 2, 2, 2], [1, 1, 1, 1]],
            mg_basis_vectors=[6, 6],
            setup_iterations=[2, 2],
            discard_setup_after=3,
            update_setup_after=2,
        ))
    amg.dd_alpha_amg_init(par)
    U, _ = dio.read_gauge_field(conf4, anti_periodic=False)
    plaq = amg.dd_alpha_amg_set_conf(U)
    yield par, U, plaq
    amg.dd_alpha_amg_free()


def test_init_set_conf_setup_solve(init4):
    par, U, plaq = init4
    assert 0 < plaq < 3
    amg.dd_alpha_amg_setup()
    b = np.ones((4, 4, 4, 4, 4, 3), dtype=complex)
    x, relres, status = amg.dd_alpha_amg_wilson_solve(b, tol=1e-9)
    assert relres < 1e-9
    assert status["iterations"] > 0
    z = amg.dd_alpha_amg_preconditioner(b)
    assert z.shape == b.shape


def test_setup_staleness_counters(init4):
    par, U, plaq = init4
    amg.dd_alpha_amg_setup()
    assert amg._status.gauge_updates_since_last_setup == 0
    # two gauge updates -> update_setup_after reached, not discard
    amg.dd_alpha_amg_set_conf(U)
    amg.dd_alpha_amg_set_conf(U)
    amg.run_dd_alpha_amg_setup_if_necessary()
    assert amg._status.gauge_updates_since_last_setup_update == 0
    assert amg._status.gauge_updates_since_last_setup == 2


def test_clover_scaling_changes_operator(init4):
    par, U, plaq = init4
    amg.dd_alpha_amg_setup()
    b = np.ones((4, 4, 4, 4, 4, 3), dtype=complex)
    x1, r1, _ = amg.dd_alpha_amg_wilson_solve(b, tol=1e-8)
    x2, r2, _ = amg.dd_alpha_amg_wilson_solve(b, tol=1e-8,
                                              scale_even=1.1, scale_odd=0.9)
    assert r1 < 1e-8 and r2 < 1e-8
    # scaled clover defines a different operator -> different solution
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x1) > 1e-3
    # and the scaling must have been restored afterwards
    x3, r3, _ = amg.dd_alpha_amg_wilson_solve(b, tol=1e-8)
    np.testing.assert_allclose(x3, x1, atol=1e-6)
