"""Thick-restart Lanczos: memory-bounded Krylov solver (SURVEY.md §2 C9
family) — eigenvalue parity with a 10x smaller basis than plain Lanczos."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from maxwell_tpu.problems import RectCavity2D
from maxwell_tpu.solvers import Pencil
from maxwell_tpu.solvers.trlanczos import thick_restart_lanczos


@pytest.fixture(scope="module")
def setup():
    cav = RectCavity2D(nx=16, ny=16)
    pencil = Pencil.from_problem(cav, block=8, dtype=jnp.float64)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    return cav, pencil, np.sort(dense[dense > 1e-8])


def test_trlanczos_smallest(setup):
    cav, pencil, discrete = setup
    res = thick_restart_lanczos(
        pencil, nev=5, ncv=24, max_restarts=60, tol=1e-9
    )
    assert res.converged, f"res {res.residuals}"
    np.testing.assert_allclose(res.eigenvalues, discrete[:5], rtol=1e-8)
    # memory cap honored: basis is ncv+1 columns regardless of iterations
    assert res.iterations > 24  # really restarted


def test_trlanczos_shift_invert(setup):
    from maxwell_tpu.solvers.shift_invert import build_shift_invert_op

    cav, pencil, discrete = setup
    sigma = 45.0
    op = build_shift_invert_op(pencil, sigma)
    res = thick_restart_lanczos(
        pencil, nev=4, ncv=16, max_restarts=10, tol=1e-9,
        apply_op=op, mode="shift_invert", sigma=sigma,
    )
    expect = np.sort(discrete[np.argsort(np.abs(discrete - sigma))[:4]])
    np.testing.assert_allclose(np.sort(res.eigenvalues), expect, rtol=1e-8)
    assert res.converged
