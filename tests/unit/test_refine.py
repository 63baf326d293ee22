"""Mixed-precision refinement (solvers/refine.py): f32 device solve +
f64 host inverse-subspace-iteration polish reaches the 1e-8 residual
contract (SURVEY.md §6) that fp32 alone cannot.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import maxwell_tpu
from maxwell_tpu.problems import RectCavity2D
from maxwell_tpu.solvers import lobpcg
from maxwell_tpu.solvers.operator import Pencil
from maxwell_tpu.solvers.precond import shifted_cg_preconditioner
from maxwell_tpu.solvers.refine import refine_f64


@pytest.fixture(scope="module")
def cavity():
    return RectCavity2D(a=1.0, b=1.0, nx=24, ny=24)


def _residuals_f64(problem, theta, X):
    K = problem.K.astype(np.float64)
    M = problem.M.astype(np.float64)
    KX, MX = K @ X, M @ X
    R = KX - MX * theta[None, :]
    scale = np.linalg.norm(KX, axis=0) + np.abs(theta) * np.linalg.norm(
        MX, axis=0
    )
    return np.linalg.norm(R, axis=0) / scale


def test_refine_reaches_1e8(cavity):
    pencil = Pencil.from_problem(cavity, dtype=jnp.float32)
    pc = shifted_cg_preconditioner(pencil, alpha=10.0, iters=16)
    res = lobpcg(pencil, nev=4, maxiter=80, tol=2e-5, precond=pc)
    assert res.converged

    ref = refine_f64(cavity, res.eigenvectors, theta=res.eigenvalues, tol=1e-8)
    assert ref.converged
    # independent f64 residual check (not the solver's own report)
    r = _residuals_f64(cavity, ref.eigenvalues, ref.eigenvectors)
    assert r.max() <= 1e-8
    # eigenvalues match the analytic TE modes to discretization accuracy
    exact = cavity.analytic_eigenvalues(4)
    np.testing.assert_allclose(ref.eigenvalues, exact, rtol=2e-2)
    # refinement must not move the eigenvalues beyond the f32 error scale
    np.testing.assert_allclose(ref.eigenvalues, res.eigenvalues, rtol=1e-4)


def test_solve_auto_refine(cavity):
    res = maxwell_tpu.solve(
        cavity, nev=4, tol=1e-8, dtype=jnp.float32, maxiter=80
    )
    assert res.converged
    r = _residuals_f64(cavity, res.eigenvalues, res.eigenvectors)
    assert r.max() <= 1e-8
