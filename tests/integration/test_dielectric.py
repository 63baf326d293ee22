"""Loaded-cavity (dielectric) solves at scale with the vacuum spectral
solve as an APPROXIMATE preconditioner (round-3 VERDICT item 9: the
claimed eps/mu generality of solvers/spectral.py, verified at 32^3).

Small-grid parity of the loaded operator itself is covered in
tests/unit/test_stencil.py (apply == assembled matrices); here the claim
under test is SOLVER behavior: bounded iteration counts as the grid
refines, graceful fallback, and a physically-sane spectrum."""

import jax.numpy as jnp
import numpy as np
import pytest

from maxwell_tpu.problems.stencil3d import StencilPencil3D
from maxwell_tpu.solvers import lobpcg
from maxwell_tpu.solvers.spectral import spectral_preconditioner


def _dielectric(n, eps_val=2.5):
    """Half-filled dielectric brick: eps_r = eps_val in the lower-x half."""
    eps = np.ones((n, n, n))
    eps[: n // 2] = eps_val
    return eps


def test_spectral_precond_accepts_loaded_rejects_pmc():
    p_load = StencilPencil3D.build(
        nx=8, ny=8, nz=8, dtype=jnp.float64, eps_r=_dielectric(8)
    )
    spectral_preconditioner(p_load, alpha=12.0)  # must not raise
    p_pmc = StencilPencil3D.build(nx=8, ny=8, nz=8, dtype=jnp.float64,
                                  bc="pmc")
    with pytest.raises(ValueError):
        spectral_preconditioner(p_pmc, alpha=12.0)


def test_dielectric_32_bounded_iterations():
    """32^3 half-filled dielectric (98k edge DOFs): LOBPCG with the vacuum
    spectral preconditioner converges in bounded iterations (within ~3x
    the vacuum count at the same size — the eps-contrast bound), and the
    eigenvalues land between the scaled vacuum limits
    lambda_vac/eps_max < lambda < lambda_vac."""
    n = 32
    eps_val = 2.5
    tol = 1e-8
    p_vac = StencilPencil3D.build(nx=n, ny=n, nz=n, dtype=jnp.float64)
    p_die = StencilPencil3D.build(
        nx=n, ny=n, nz=n, dtype=jnp.float64, eps_r=_dielectric(n, eps_val)
    )
    pc_vac = spectral_preconditioner(p_vac, alpha=12.0)
    pc_die = spectral_preconditioner(p_die, alpha=12.0)

    res_vac = lobpcg(p_vac, nev=4, maxiter=60, tol=tol, precond=pc_vac)
    assert res_vac.converged
    res_die = lobpcg(p_die, nev=4, maxiter=180, tol=tol, precond=pc_die)
    assert res_die.converged, f"residuals {res_die.residuals}"
    assert res_die.iterations <= 3 * res_vac.iterations + 10, (
        f"dielectric took {res_die.iterations} vs vacuum "
        f"{res_vac.iterations} — preconditioner not contrast-bounded"
    )
    lam_vac = np.sort(res_vac.eigenvalues)
    lam_die = np.sort(res_die.eigenvalues)
    assert np.all(lam_die < lam_vac + 1e-9)
    assert np.all(lam_die > lam_vac / eps_val - 1e-9)


def test_dielectric_small_parity_with_dense():
    """12^3 dielectric: the spectrally-preconditioned solve matches the
    dense generalized eigensolver."""
    import scipy.linalg

    from maxwell_tpu.problems import BrickCavity3D

    n = 12
    eps = _dielectric(n, 3.0)
    cav = BrickCavity3D(nx=n, ny=n, nz=n, eps_r=eps)
    p = StencilPencil3D.build(
        nx=n, ny=n, nz=n, dtype=jnp.float64, eps_r=eps
    )
    pc = spectral_preconditioner(p, alpha=12.0)
    res = lobpcg(p, nev=4, maxiter=150, tol=1e-9, precond=pc)
    assert res.converged
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:4]
    np.testing.assert_allclose(
        np.sort(res.eigenvalues), discrete, rtol=1e-7
    )
