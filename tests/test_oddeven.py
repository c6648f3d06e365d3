"""Odd-even preconditioning: Schur-complement identities and iteration
parity with the reference binary (tests/ground_truth)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ddalphaamg_tpu import io as dio
from ddalphaamg_tpu.operators import wilson
from ddalphaamg_tpu.operators.oddeven import (
    OddEvenOperator,
    OddEvenPreconditioner,
    solve_oddeven,
)
from ddalphaamg_tpu.solvers import fgmres

M0, CSW = -0.5, 1.0
LAT = (4, 4, 4, 4)


@pytest.fixture(scope="module")
def op4(conf4):
    U, _ = dio.read_gauge_field(conf4, anti_periodic=True)
    return wilson.WilsonOperator.from_gauge(U, m0=M0, csw=CSW)


@pytest.fixture(scope="module")
def oe4(op4):
    return OddEvenOperator.from_wilson(op4)


@pytest.fixture(scope="module")
def rhs(op4):
    return jnp.ones((*LAT, 4, 3), dtype=complex)


def test_parity_split_is_complete(oe4, op4):
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(*LAT, 4, 3)) + 1j * rng.normal(size=(*LAT, 4, 3)))
    full = wilson.d_plus_clover(op4, v)
    # D v = A v + D_eo v_o + D_oe v_e  (hopping splits exactly by parity)
    split = oe4.diag(v) + oe4.hop_from_odd(v) + oe4.hop_from_even(v)
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), atol=1e-12)


def test_clover_inverse(oe4):
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(*LAT, 4, 3)) + 1j * rng.normal(size=(*LAT, 4, 3)))
    w = oe4.diag_oo_inv(oe4.odd * oe4.diag(oe4.odd * v))
    np.testing.assert_allclose(np.asarray(w), np.asarray(oe4.odd * v), atol=1e-10)


def test_oe_solve_equals_full_solve(oe4, op4, rhs):
    """Reference oddeven_PRECISION_test analog: the OE-reconstructed solve
    solves the full system."""
    res = solve_oddeven(oe4, rhs, tol=1e-10)
    r = np.asarray(rhs) - np.asarray(wilson.d_plus_clover(op4, res.x))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(rhs)) < 1e-9
    # Schur solve is much cheaper than the 149-iteration full solve
    assert res.iterations < 100


def test_method4_iteration_parity(op4, rhs):
    """Reference ground truth (tests/ground_truth/4x4_method4_oe.log):
    20 iterations, exact relres 7.755425e-11."""
    M = OddEvenPreconditioner(op4, block_iter=4, cycles=1)
    res = fgmres(lambda v: wilson.d_plus_clover(op4, v), rhs,
                 preconditioner=M, tol=1e-10, restart_length=50, max_restarts=20)
    assert res.iterations == 20, res.iterations
    r = np.asarray(rhs) - np.asarray(wilson.d_plus_clover(op4, res.x))
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(rhs))
    assert abs(rel - 7.755425e-11) < 2e-12, rel
