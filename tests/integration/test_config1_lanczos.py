"""BASELINE.json config 1: 2D rectangular cavity TE modes — Lanczos on the
generalized pencil, eigenvalues vs analytic + scipy parity (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from maxwell_tpu.problems import RectCavity2D, te_eigenvalues_2d
from maxwell_tpu.solvers import Pencil, lanczos


@pytest.fixture(scope="module")
def setup():
    cav = RectCavity2D(a=1.0, b=1.0, nx=16, ny=16)
    pencil = Pencil.from_problem(cav, block=8, dtype=jnp.float64)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])
    return cav, pencil, discrete


def test_lanczos_matches_discrete_spectrum(setup):
    cav, pencil, discrete = setup
    nev = 5
    res = lanczos(pencil, nev=nev, maxiter=260, tol=1e-8)
    np.testing.assert_allclose(res.eigenvalues, discrete[:nev], rtol=1e-8)
    assert res.converged, f"residuals {res.residuals}"


def test_lanczos_matches_analytic(setup):
    cav, pencil, _ = setup
    nev = 5
    exact = te_eigenvalues_2d(1.0, 1.0, nev)
    res = lanczos(pencil, nev=nev, maxiter=260, tol=1e-8)
    # 16x16 grid: O(h^2) error ~<2%
    np.testing.assert_allclose(res.eigenvalues, exact, rtol=2.5e-2)


def test_lanczos_eigenvectors_are_physical(setup):
    """Ritz vectors have no gradient component and satisfy the residual."""
    cav, pencil, _ = setup
    res = lanczos(pencil, nev=3, maxiter=260, tol=1e-8)
    X = res.eigenvectors
    # gradient component: ||G^T M x|| should be ~0
    g = np.abs(cav.G.T @ (cav.M @ X)).max()
    assert g < 1e-6, f"gradient leakage {g}"


def test_top_level_solve_api(setup):
    """maxwell_tpu.solve(): one-call convenience path."""
    import maxwell_tpu

    cav, _, discrete = setup
    res = maxwell_tpu.solve(cav, nev=4, tol=1e-9)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, discrete[:4], rtol=1e-7)
