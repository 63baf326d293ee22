"""Level-scheduled triangular solve + device sparse LU vs scipy splu
(SURVEY.md §4 unit tier, config-3 building block)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from maxwell_tpu.kernels.tri_solve import LevelSchedule, SparseLUDevice
from maxwell_tpu.problems import RectCavity2D


def test_level_schedule_lower():
    rng = np.random.default_rng(3)
    n = 80
    L = sp.random(n, n, density=0.05, random_state=3).tolil()
    L[np.arange(n), np.arange(n)] = 1.0  # unit diagonal
    L = sp.tril(L.tocsr()).tocsr()
    ls = LevelSchedule.from_csr(L, lower=True)
    b = rng.standard_normal(n)
    x = np.asarray(ls.solve(jnp.asarray(b)))
    x_ref = spla.spsolve_triangular(L.tocsr(), b, lower=True)
    np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-12)


def test_level_schedule_upper():
    rng = np.random.default_rng(4)
    n = 60
    U = sp.random(n, n, density=0.05, random_state=4).tolil()
    U[np.arange(n), np.arange(n)] = 2.0 + rng.random(n)
    U = sp.triu(U.tocsr()).tocsr()
    ls = LevelSchedule.from_csr(U, lower=False)
    b = rng.standard_normal((n, 3))
    x = np.asarray(ls.solve(jnp.asarray(b)))
    x_ref = spla.spsolve_triangular(U.tocsr(), b, lower=False)
    np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-12)


def test_sparse_lu_device_vs_splu():
    cav = RectCavity2D(nx=10, ny=10)
    sigma = 5.0
    A = (cav.K - sigma * cav.M).tocsc()
    lu = spla.splu(A)
    dev = SparseLUDevice.from_splu(lu)
    rng = np.random.default_rng(5)
    b = rng.standard_normal(A.shape[0])
    x_ref = lu.solve(b)
    x = np.asarray(dev.solve(jnp.asarray(b)))
    np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-10)
    # multi-RHS
    B = rng.standard_normal((A.shape[0], 4))
    X = np.asarray(dev.solve(jnp.asarray(B)))
    np.testing.assert_allclose(X, lu.solve(B), rtol=1e-9, atol=1e-10)
