"""Operator property tests (SURVEY.md §4 unit tier): K symmetric SPSD with
exact gradient nullspace, M SPD, analytic-oracle sanity."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from maxwell_tpu.problems import RectCavity2D, BrickCavity3D, te_eigenvalues_2d


@pytest.fixture(scope="module")
def cav2d():
    return RectCavity2D(a=1.0, b=1.0, nx=12, ny=10)


@pytest.fixture(scope="module")
def cav3d():
    return BrickCavity3D(a=1.0, b=1.0, c=1.0, nx=5, ny=4, nz=3)


@pytest.mark.parametrize("fix", ["cav2d", "cav3d"])
def test_symmetry_and_spd(fix, request):
    cav = request.getfixturevalue(fix)
    K, M = cav.K, cav.M
    assert abs(K - K.T).max() < 1e-12
    assert abs(M - M.T).max() < 1e-12
    # M SPD: smallest eigenvalue positive
    lam_min = spla.eigsh(M, k=1, which="SA", return_eigenvectors=False)[0]
    assert lam_min > 0
    # K PSD: no negative eigenvalues (allow roundoff)
    lam_min_K = spla.eigsh(
        K, k=1, which="SA", return_eigenvectors=False, maxiter=5000
    )[0]
    assert lam_min_K > -1e-10


@pytest.mark.parametrize("fix", ["cav2d", "cav3d"])
def test_gradient_nullspace_exact(fix, request):
    cav = request.getfixturevalue(fix)
    KG = cav.K @ cav.G
    assert abs(KG).max() < 1e-12, "K @ G must vanish identically"
    # G must have full column rank (interior node count)
    assert np.linalg.matrix_rank(cav.G.toarray()) == cav.G.shape[1]


def dense_nonzero_eigs(cav, nev, zero_tol=1e-8):
    """Dense generalized eigensolve oracle, nullspace (lambda=0) filtered."""
    import scipy.linalg

    vals = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    return np.sort(vals[vals > zero_tol])[:nev]


def test_2d_eigenvalues_vs_analytic(cav2d):
    """Discrete generalized eigenvalues converge to analytic TE modes."""
    nev = 5
    exact = te_eigenvalues_2d(cav2d.a, cav2d.b, nev)
    vals = dense_nonzero_eigs(cav2d, nev)
    # O(h^2) discretization error on a 12x10 grid (up to ~3.5% on mode 5)
    assert np.allclose(vals, exact, rtol=5e-2)


def test_2d_eigenvalue_convergence_rate():
    """Eigenvalue error decreases ~4x per mesh refinement (O(h^2))."""
    errs = []
    exact = te_eigenvalues_2d(1.0, 1.0, 1)[0]
    for nx in (8, 16):
        cav = RectCavity2D(nx=nx, ny=nx)
        v = dense_nonzero_eigs(cav, 1)[0]
        errs.append(abs(v - exact) / exact)
    assert errs[1] < errs[0] / 3.0


def test_3d_eigenvalues_vs_analytic():
    cav = BrickCavity3D(nx=6, ny=6, nz=6)
    nev = 3
    exact = cav.analytic_eigenvalues(nev)  # 2*pi^2 triple-degenerate
    vals = dense_nonzero_eigs(cav, nev)
    assert np.allclose(vals, exact, rtol=5e-2)


def test_pmc_boundary_conditions():
    """Natural (PMC) walls: nullspace = all nodes mod constants; nonzero
    modes = Dirichlet Laplacian eigenvalues (m, n >= 1)."""
    import scipy.linalg

    cav = RectCavity2D(nx=14, ny=12, a=1.0, b=0.8, bc="pmc")
    vals = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    n_null = (vals < 1e-8).sum()
    assert n_null == cav.G.shape[1] == (15 * 13 - 1)
    nz = np.sort(vals[vals > 1e-8])[:4]
    exact = cav.analytic_eigenvalues(4)
    np.testing.assert_allclose(nz, exact, rtol=3e-2)  # O(h^2), coarse grid
    # K @ G == 0 still exact
    assert abs(cav.K @ cav.G).max() < 1e-12


def test_pmc_solver_end_to_end():
    import maxwell_tpu

    cav = RectCavity2D(nx=16, ny=14, a=1.0, b=0.8, bc="pmc")
    res = maxwell_tpu.solve(cav, nev=3, tol=1e-9)
    assert res.converged
    np.testing.assert_allclose(
        res.eigenvalues, cav.analytic_eigenvalues(3), rtol=2e-2
    )


def test_pmc_3d_duality():
    """3D PMC box: by E<->H duality the nonzero spectrum equals the PEC
    box's analytic modes (within O(h^2) on this coarse grid)."""
    import scipy.linalg

    cav = BrickCavity3D(nx=5, ny=5, nz=5, bc="pmc")
    vals = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    assert (vals < 1e-8).sum() == cav.G.shape[1] == 6**3 - 1
    nz = np.sort(vals[vals > 1e-8])[:4]
    np.testing.assert_allclose(nz, cav.analytic_eigenvalues(4), rtol=4e-2)


def test_assembled_pencil_fast_projector():
    """Vacuum-PEC assembled 3D pencils get the exact tensor-product
    projector (round-1 VERDICT item 4); it must agree with the CG projector
    to roundoff, including under RCM row permutation (node space is
    untouched by row reordering)."""
    import jax.numpy as jnp

    from maxwell_tpu.problems import BrickCavity3D
    from maxwell_tpu.sparse.reorder import PermutedProblem
    from maxwell_tpu.solvers.operator import Pencil

    for prob in (
        BrickCavity3D(a=1.1, b=0.9, c=1.2, nx=5, ny=4, nz=6),
        PermutedProblem(BrickCavity3D(nx=5, ny=5, nz=5)),
    ):
        p = Pencil.from_problem(prob, dtype=jnp.float64)
        assert p.fastproj is not None
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.standard_normal((p.n_padded, 3)))
        Pf = np.asarray(p.project(X))
        Pc = np.asarray(p.proj.project(p.M_mm, X, tol=1e-13, maxiter=500))
        np.testing.assert_allclose(Pf, Pc, atol=1e-11)
    # materials / PMC / 2D keep the CG projector
    mat = BrickCavity3D(nx=3, ny=3, nz=3, eps_r=np.ones((3, 3, 3)))
    assert Pencil.from_problem(mat).fastproj is None
