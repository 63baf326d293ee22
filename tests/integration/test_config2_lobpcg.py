"""BASELINE.json config 2: generalized K x = lambda M x via LOBPCG, BSR
storage — residual <= tol and eigenvalue parity vs scipy (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from maxwell_tpu.problems import RectCavity2D
from maxwell_tpu.solvers import Pencil, lobpcg
from maxwell_tpu.solvers.precond import shifted_cg_preconditioner


@pytest.fixture(scope="module")
def setup():
    cav = RectCavity2D(a=1.0, b=1.0, nx=16, ny=16)
    pencil = Pencil.from_problem(cav, block=8, dtype=jnp.float64)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])
    pc = shifted_cg_preconditioner(pencil, alpha=10.0, iters=20)
    return cav, pencil, discrete, pc


def test_lobpcg_matches_discrete_spectrum(setup):
    cav, pencil, discrete, pc = setup
    nev = 5
    res = lobpcg(pencil, nev=nev, maxiter=100, tol=1e-9, precond=pc)
    assert res.converged, f"residuals {res.residuals}, iters {res.iterations}"
    np.testing.assert_allclose(res.eigenvalues, discrete[:nev], rtol=1e-7)


def test_lobpcg_many_eigenpairs(setup):
    """20-eigenpair block solve (the config-5 workload shape, single device)."""
    cav, pencil, discrete, pc = setup
    nev = 20
    res = lobpcg(pencil, nev=nev, m=26, maxiter=200, tol=1e-8, precond=pc)
    assert res.converged, f"max res {res.residuals.max():.2e}"
    np.testing.assert_allclose(res.eigenvalues, discrete[:nev], rtol=1e-6)


def test_lobpcg_eigenvectors_m_orthonormal(setup):
    cav, pencil, _, pc = setup
    res = lobpcg(pencil, nev=4, maxiter=100, tol=1e-9, precond=pc)
    X = res.eigenvectors
    gram = X.T @ (cav.M @ X)
    np.testing.assert_allclose(gram, np.eye(4), atol=1e-8)
    # no gradient leakage
    assert np.abs(cav.G.T @ (cav.M @ X)).max() < 1e-7


def test_lobpcg_incremental_deflation(setup):
    """Hard deflation (C12): solve 4 pairs, then the NEXT 4 by deflating
    against the first block — incremental multi-eigenpair workflow."""
    cav, pencil, discrete, pc = setup
    r1 = lobpcg(pencil, nev=4, maxiter=100, tol=1e-9, precond=pc)
    assert r1.converged
    r2 = lobpcg(
        pencil, nev=4, maxiter=150, tol=1e-8, precond=pc,
        deflate_Q=jnp.asarray(r1.eigenvectors),
    )
    assert r2.converged, f"res {r2.residuals}"
    np.testing.assert_allclose(r2.eigenvalues, discrete[4:8], rtol=1e-6)
