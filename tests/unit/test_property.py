"""Property tests on random matrices (SURVEY.md §4 property tier): solver
convergence on random SPD/SPSD pencils, deflation idempotence, projector
properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
import scipy.sparse as sp

from maxwell_tpu.sparse.bsr import BSRMatrix
from maxwell_tpu.solvers import Pencil, lanczos, lobpcg


def random_spd_pencil(n=180, density=0.04, seed=0):
    """Random SPD pencil with controlled conditioning (kappa ~ 1e2-1e3) —
    convergence property, not a stress test."""
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=seed)
    # diagonal spread gives the bottom eigenvalues real gaps (LOBPCG rate
    # depends on the spectral gap, not just kappa)
    spread = 1.0 + 10.0 * np.arange(n) / n + rng.random(n)
    K = (0.3 * (A.T @ A) + sp.diags(spread)).tocsr()  # SPD, lam >= ~1
    B = sp.random(n, n, density=density, random_state=seed + 1)
    M = (0.1 * (B.T @ B) + sp.eye(n)).tocsr()  # SPD, well-conditioned
    pk = BSRMatrix.from_csr(K, block=8, dtype=jnp.float64)
    pm = BSRMatrix.from_csr(M, block=8, dtype=jnp.float64)
    return Pencil(K=pk, M=pm, proj=None), K, M


@pytest.mark.parametrize("seed", [0, 3])
def test_lobpcg_random_spd(seed):
    pencil, K, M = random_spd_pencil(seed=seed)
    vals = scipy.linalg.eigh(K.toarray(), M.toarray(), eigvals_only=True)
    res = lobpcg(pencil, nev=4, maxiter=300, tol=1e-8)
    assert res.converged, f"res {res.residuals}"
    np.testing.assert_allclose(res.eigenvalues, np.sort(vals)[:4], rtol=1e-7)


def test_lanczos_random_standard():
    """Standard eigenproblem (M = None)."""
    rng = np.random.default_rng(7)
    n = 160
    A = sp.random(n, n, density=0.05, random_state=7)
    K = (A.T @ A + sp.eye(n)).tocsr()
    pencil = Pencil(K=BSRMatrix.from_csr(K, block=8, dtype=jnp.float64))
    vals = np.sort(scipy.linalg.eigh(K.toarray(), eigvals_only=True))
    res = lanczos(pencil, nev=4, maxiter=170, tol=1e-8)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, vals[:4], rtol=1e-8)


def test_deflation_idempotent_and_orthogonal():
    from maxwell_tpu.solvers.deflation import deflate_against

    rng = np.random.default_rng(1)
    n, q = 120, 5
    M = np.eye(n)
    Q, _ = np.linalg.qr(rng.standard_normal((n, q)))
    MQ = M @ Q
    X = jnp.asarray(rng.standard_normal((n, 3)))
    X1 = deflate_against(X, jnp.asarray(Q), jnp.asarray(MQ))
    X2 = deflate_against(X1, jnp.asarray(Q), jnp.asarray(MQ))
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), atol=1e-12)
    assert np.abs(Q.T @ np.asarray(X1)).max() < 1e-12


def test_projector_idempotent_2d():
    from maxwell_tpu.problems import RectCavity2D

    cav = RectCavity2D(nx=10, ny=8)
    pencil = Pencil.from_problem(cav, block=8, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(2), (pencil.n_padded,), jnp.float64)
    Px = pencil.project(x)
    PPx = pencil.project(Px)
    rel = float(jnp.linalg.norm(PPx - Px) / jnp.linalg.norm(Px))
    assert rel < 1e-9


def test_inloop_soft_locking_freezes_columns():
    """Round-4 VERDICT item 8: with lock_tol > 0, a column that reaches
    the lock threshold is frozen BIT-EXACTLY inside the compiled loop
    while the remaining columns keep converging — verified by comparing
    two runs that share the RNG: one stopped right after the first lock,
    one run further."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maxwell_tpu.problems import BrickCavity3D
    from maxwell_tpu.solvers.lobpcg import lobpcg_run
    from maxwell_tpu.solvers.operator import Pencil
    from maxwell_tpu.solvers.precond import shifted_cg_preconditioner

    cav = BrickCavity3D(nx=6, ny=6, nz=6)
    pencil = Pencil.from_problem(cav, kernel="ref", dtype=jnp.float32)
    pc = shifted_cg_preconditioner(pencil, alpha=15.0, iters=16)
    m = 6
    key = jax.random.PRNGKey(3)
    X0 = jax.random.normal(key, (pencil.n_padded, m), jnp.float32)
    X0 = X0.at[pencil.n:].set(0.0)
    X0 = pencil.project(X0)
    pcp = jax.tree_util.Partial(pc)

    lock_tol = 1e-4
    # run until the FIRST column locks: iterate in growing maxiter until
    # some tracked residual <= lock_tol but not all
    it_first = None
    for it in range(4, 60, 2):
        theta, X, res, _, _ = lobpcg_run(
            pencil, X0, it, 1e-12, pcp, nev=4, lock_tol=lock_tol
        )
        r = np.asarray(res)[:4]
        if (r <= lock_tol).any() and not (r <= lock_tol).all():
            it_first = it
            X_at_lock = np.asarray(X)
            locked_cols = np.where(r <= lock_tol)[0]
            res_at_lock = r
            break
    assert it_first is not None, "no partial-lock state found"

    # run 6 more iterations: locked columns must be BIT-identical, the
    # not-yet-locked ones must have improved
    theta2, X2, res2, _, _ = lobpcg_run(
        pencil, X0, it_first + 6, 1e-12, pcp, nev=4, lock_tol=lock_tol
    )
    X2 = np.asarray(X2)
    r2 = np.asarray(res2)[:4]
    for j in locked_cols:
        np.testing.assert_array_equal(
            X2[:, j], X_at_lock[:, j],
            err_msg=f"locked column {j} drifted",
        )
    active = [j for j in range(4) if j not in locked_cols]
    assert min(r2[j] / res_at_lock[j] for j in active) < 0.5, (
        "active columns did not keep converging past the lock"
    )
