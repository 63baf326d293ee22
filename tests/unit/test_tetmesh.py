"""Unstructured tet Nedelec elements (problems/tetmesh.py): exactness of
the element integrals, the discrete de Rham identity K@G=0, and eigenvalue
parity of the full solver stack on a genuinely non-tensor-product mesh
(SURVEY.md §2 C2; round-1 VERDICT missing item 5)."""

import numpy as np
import pytest
import scipy.linalg as sla

from maxwell_tpu.problems.tetmesh import (
    TetCavity,
    brick_tet_mesh,
    whitney_element_matrices,
)


def _quadrature_element_matrices(verts4):
    """Oracle: 4-point degree-2 quadrature (exact for Whitney mass) on one
    tet given as (4, 3) vertices. Mirrors the closed-form path only through
    the basis definition, not the integral formulas."""
    v = np.asarray(verts4, float)
    J = v[1:] - v[0]
    vol = abs(np.linalg.det(J)) / 6.0
    g = np.zeros((4, 3))
    g[1:] = np.linalg.inv(J).T
    g[0] = -g[1:].sum(axis=0)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    a = (5.0 - np.sqrt(5.0)) / 20.0
    b = (5.0 + 3.0 * np.sqrt(5.0)) / 20.0
    qpts = np.full((4, 4), a)
    np.fill_diagonal(qpts, b)  # barycentric quadrature points, weight 1/4
    Ke = np.zeros((6, 6))
    Me = np.zeros((6, 6))
    for lam in qpts:
        W = np.array([lam[p] * g[q] - lam[q] * g[p] for p, q in edges])
        C = np.array([2.0 * np.cross(g[p], g[q]) for p, q in edges])
        Ke += 0.25 * vol * (C @ C.T)
        Me += 0.25 * vol * (W @ W.T)
    return Ke, Me


def test_element_matrices_vs_quadrature():
    rng = np.random.default_rng(3)
    verts = rng.standard_normal((4, 3))
    if np.linalg.det(verts[1:] - verts[0]) < 0:
        verts[[2, 3]] = verts[[3, 2]]
    tets = np.array([[0, 1, 2, 3]])
    Ke, Me, vol, pairs = whitney_element_matrices(verts, tets)
    Kq, Mq = _quadrature_element_matrices(verts)
    assert np.allclose(Ke[0], Kq, rtol=1e-12, atol=1e-13)
    assert np.allclose(Me[0], Mq, rtol=1e-12, atol=1e-13)
    assert vol[0] > 0


def test_de_rham_and_spd():
    cav = TetCavity(n=3)
    assert abs(cav.K - cav.K.T).max() < 1e-13
    assert abs(cav.M - cav.M.T).max() < 1e-13
    # curl grad = 0 holds EXACTLY for Whitney spaces
    assert abs(cav.K @ cav.G).max() < 1e-12
    wM = np.linalg.eigvalsh(cav.M.toarray())
    assert wM.min() > 0
    wK = np.linalg.eigvalsh(cav.K.toarray())
    assert wK.min() > -1e-10  # PSD with gradient nullspace


def test_kuhn_mesh_conforming():
    verts, tets = brick_tet_mesh(1, 1, 1, 2, 2, 2)
    # every interior face shared by exactly 2 tets, volumes fill the brick
    from maxwell_tpu.problems.tetmesh import _TET_FACES

    faces = np.sort(tets[:, _TET_FACES].reshape(-1, 3), axis=1)
    _, counts = np.unique(faces, axis=0, return_counts=True)
    assert set(counts) <= {1, 2}
    x = verts[tets]
    vols = np.abs(np.linalg.det(x[:, 1:] - x[:, :1])) / 6.0
    assert np.isclose(vols.sum(), 1.0)


def test_eigenvalues_unstructured_vs_dense_oracle():
    # jiggle interior vertices so the mesh is genuinely unstructured
    verts, tets = brick_tet_mesh(1, 1, 1, 4, 4, 4)
    rng = np.random.default_rng(7)
    h = 0.25
    interior = (
        (verts[:, 0] > 1e-9) & (verts[:, 0] < 1 - 1e-9)
        & (verts[:, 1] > 1e-9) & (verts[:, 1] < 1 - 1e-9)
        & (verts[:, 2] > 1e-9) & (verts[:, 2] < 1 - 1e-9)
    )
    verts = verts.copy()
    verts[interior] += 0.12 * h * rng.standard_normal((interior.sum(), 3))
    cav = TetCavity(verts=verts, tets=tets)
    assert abs(cav.K @ cav.G).max() < 1e-12  # exact on ANY mesh

    w = sla.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    nonzero = w[w > 1e-6]
    # coarse mesh: discretization error is large but the low modes must sit
    # near the analytic box values
    analytic = cav.analytic_eigenvalues(3)
    assert np.allclose(nonzero[:3], analytic, rtol=0.12)
    # nullspace dimension = number of interior nodes (gradients)
    assert (w < 1e-6).sum() == cav.G.shape[1]


@pytest.mark.parametrize("dtype", ["f64"])
def test_solver_stack_on_tet_pencil(dtype):
    import jax
    import jax.numpy as jnp

    from maxwell_tpu.solvers import lobpcg
    from maxwell_tpu.solvers.operator import Pencil
    from maxwell_tpu.solvers.precond import shifted_cg_preconditioner

    cav = TetCavity(n=4)
    pencil = Pencil.from_problem(cav, block=4, dtype=jnp.float64)
    assert pencil.fastproj is None  # tensor-product fast path must NOT engage
    pc = shifted_cg_preconditioner(pencil, alpha=15.0, iters=16)
    res = lobpcg(pencil, nev=4, maxiter=80, tol=1e-8, precond=pc)
    assert float(np.max(res.residuals)) < 1e-8
    w = sla.eigh(cav.K.toarray(), cav.M.toarray(), eigvals_only=True)
    ref = w[w > 1e-6][:4]
    assert np.allclose(np.sort(res.eigenvalues), ref, rtol=1e-7)
