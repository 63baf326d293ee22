"""BASELINE.json config 3: shift-invert Lanczos for interior eigenmodes near
a target frequency — parity vs scipy eigsh(sigma=...) (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from maxwell_tpu.problems import RectCavity2D
from maxwell_tpu.solvers import Pencil
from maxwell_tpu.solvers.shift_invert import shift_invert_lanczos


@pytest.fixture(scope="module")
def setup():
    cav = RectCavity2D(a=1.0, b=1.0, nx=12, ny=12)
    pencil = Pencil.from_problem(cav, block=8, dtype=jnp.float64)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])
    return cav, pencil, discrete


def test_interior_modes_near_sigma(setup):
    """Target interior modes near sigma=45 (between modes 4-5 and 6-7)."""
    cav, pencil, discrete = setup
    sigma = 45.0
    nev = 4
    res = shift_invert_lanczos(pencil, sigma=sigma, nev=nev, maxiter=40, tol=1e-8)
    # oracle: nev discrete eigenvalues closest to sigma
    expect = discrete[np.argsort(np.abs(discrete - sigma))[:nev]]
    np.testing.assert_allclose(
        np.sort(res.eigenvalues), np.sort(expect), rtol=1e-8
    )
    assert res.converged, f"residuals {res.residuals}"


def test_smallest_modes_via_small_sigma(setup):
    cav, pencil, discrete = setup
    res = shift_invert_lanczos(pencil, sigma=1.0, nev=5, maxiter=40, tol=1e-8)
    np.testing.assert_allclose(res.eigenvalues, discrete[:5], rtol=1e-8)
    assert res.converged


def test_iterative_backend_matches_direct(setup):
    """SURVEY.md §7.5 option (c): matrix-free MINRES shift-invert parity."""
    cav, pencil, discrete = setup
    sigma = 45.0
    r_it = shift_invert_lanczos(
        pencil, sigma=sigma, nev=4, maxiter=30, tol=1e-7, backend="iterative"
    )
    expect = discrete[np.argsort(np.abs(discrete - sigma))[:4]]
    np.testing.assert_allclose(
        np.sort(r_it.eigenvalues), np.sort(expect), rtol=1e-7
    )
    assert r_it.converged


def test_iterative_shift_invert_on_stencil():
    """Fully matrix-free interior-mode solve: stencil pencil + MINRES
    shift-invert — no matrix is ever assembled."""
    import scipy.linalg

    from maxwell_tpu.problems import RectCavity2D
    from maxwell_tpu.problems.stencil2d import StencilPencil2D

    cav = RectCavity2D(nx=12, ny=12)
    stp = StencilPencil2D.build(nx=12, ny=12, dtype=jnp.float64)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])
    sigma = 45.0
    res = shift_invert_lanczos(
        stp, sigma=sigma, nev=3, maxiter=30, tol=1e-7, backend="iterative"
    )
    expect = discrete[np.argsort(np.abs(discrete - sigma))[:3]]
    np.testing.assert_allclose(
        np.sort(res.eigenvalues), np.sort(expect), rtol=1e-7
    )
