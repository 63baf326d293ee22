"""Golden fixture parity (SURVEY.md §2 C16): solvers must reproduce the
stored reference eigenvalues within the stored residual tolerance.

Regeneration recipe (if discretization code changes INTENTIONALLY):
dense-eigh each problem in golden.json, filter lambda > 1e-8, sort, store.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from maxwell_tpu.problems.golden import golden_eigenvalues, load_golden
from maxwell_tpu.cli.run import build_problem
from maxwell_tpu.solvers import Pencil, lobpcg
from maxwell_tpu.solvers.precond import shifted_cg_preconditioner


def test_golden_file_loads():
    g = load_golden()
    assert set(g) >= {"rect2d_16x16", "brick3d_6x6x6"}
    for v in g.values():
        assert len(v["eigenvalues"]) > 0


@pytest.mark.parametrize("name", ["rect2d_16x16", "brick3d_6x6x6"])
def test_solver_matches_golden(name):
    vals, tol, pcfg = golden_eigenvalues(name)
    problem = build_problem(pcfg)
    pencil = Pencil.from_problem(problem, block=8, dtype=jnp.float64)
    pc = shifted_cg_preconditioner(pencil, alpha=float(vals[0]), iters=20)
    nev = 5
    res = lobpcg(pencil, nev=nev, maxiter=150, tol=tol, precond=pc)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, vals[:nev], rtol=1e-7)


def test_assembly_matches_golden_oracle():
    """Fresh dense-oracle recomputation matches the stored fixture (guards
    against silent discretization drift)."""
    import scipy.linalg

    vals, _, pcfg = golden_eigenvalues("rect2d_12x10")
    cav = build_problem(pcfg)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    fresh = np.sort(dense[dense > 1e-8])[: len(vals)]
    np.testing.assert_allclose(fresh, vals, rtol=1e-12)


def test_stencil3d_matches_golden():
    """3D stencil (assembly-free) path reproduces the assembled golden
    fixture — golden coverage for the flagship operator (round-1 VERDICT
    item 10)."""
    from maxwell_tpu.problems.stencil3d import StencilPencil3D

    vals, tol, pcfg = golden_eigenvalues("brick3d_6x6x6")
    stp = StencilPencil3D.build(
        nx=pcfg["nx"], ny=pcfg["ny"], nz=pcfg["nz"], dtype=jnp.float64
    )
    pc = shifted_cg_preconditioner(stp, alpha=float(vals[0]), iters=16)
    res = lobpcg(stp, nev=4, maxiter=150, tol=tol, precond=pc)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, vals[:4], rtol=1e-7)


def test_stencil3d_pmc_matches_golden():
    """PMC golden via the field-tap fast path."""
    from maxwell_tpu.problems.stencil3d import StencilPencil3D

    vals, tol, pcfg = golden_eigenvalues("brick3d_5x5x5_pmc")
    stp = StencilPencil3D.build(
        nx=pcfg["nx"], ny=pcfg["ny"], nz=pcfg["nz"], dtype=jnp.float64,
        bc="pmc",
    )
    assert stp.ftaps_meta is not None
    pc = shifted_cg_preconditioner(stp, alpha=float(vals[0]), iters=16)
    res = lobpcg(stp, nev=3, maxiter=200, tol=tol, precond=pc)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, vals[:3], rtol=1e-7)


def test_stencil3d_dielectric_matches_golden():
    """Half-filled dielectric golden via the field-tap fast path."""
    from maxwell_tpu.problems.stencil3d import StencilPencil3D

    vals, tol, pcfg = golden_eigenvalues("brick3d_5x4x4_halfeps4")
    nx, ny, nz = pcfg["nx"], pcfg["ny"], pcfg["nz"]
    eps = np.ones((nx, ny, nz))
    eps[: nx // 2] = pcfg["eps_half_x"]
    stp = StencilPencil3D.build(
        nx=nx, ny=ny, nz=nz, dtype=jnp.float64, eps_r=eps
    )
    assert stp.ftaps_meta is not None
    pc = shifted_cg_preconditioner(stp, alpha=float(vals[0]), iters=16)
    res = lobpcg(stp, nev=3, maxiter=200, tol=tol, precond=pc)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, vals[:3], rtol=1e-7)
