"""Native C++ component tests: LDL^T factorization, level scheduling,
blocked-ELL conversion (SURVEY.md §2 native checklist)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from maxwell_tpu import native
from maxwell_tpu.problems import RectCavity2D

pytestmark = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def cav():
    return RectCavity2D(nx=12, ny=12)


@pytest.mark.parametrize("sigma", [0.0, 45.0])
def test_ldlt_reconstruction(cav, sigma):
    A = (cav.K + cav.M) if sigma == 0 else (cav.K - sigma * cav.M)
    A = A.tocsc()
    Lp, Li, Lx, D = native.ldlt_factor(sp.triu(A).tocsc())
    n = A.shape[0]
    L = sp.csc_matrix((Lx, Li, Lp), shape=(n, n)) + sp.eye(n)
    err = abs((L @ sp.diags(D) @ L.T) - A).max()
    assert err < 1e-9


def test_ldlt_device_solve(cav):
    from maxwell_tpu.kernels.tri_solve import SparseLDLTDevice

    sigma = 45.0
    A = (cav.K - sigma * cav.M).tocsr()
    dev = SparseLDLTDevice.factor(A)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0])
    x = np.asarray(dev.solve(jnp.asarray(b)))
    err = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert err < 1e-10, err


def test_shift_invert_ldlt_backend_matches_splu(cav):
    import scipy.linalg

    from maxwell_tpu.solvers import Pencil
    from maxwell_tpu.solvers.shift_invert import shift_invert_lanczos

    pencil = Pencil.from_problem(cav, block=8, dtype=jnp.float64)
    r_ldlt = shift_invert_lanczos(
        pencil, sigma=45.0, nev=4, maxiter=40, backend="ldlt"
    )
    r_splu = shift_invert_lanczos(
        pencil, sigma=45.0, nev=4, maxiter=40, backend="splu"
    )
    np.testing.assert_allclose(
        r_ldlt.eigenvalues, r_splu.eigenvalues, rtol=1e-9
    )
    assert r_ldlt.converged


def test_bell_native_matches_python(cav):
    from maxwell_tpu.sparse.bsr import BSRMatrix

    B = BSRMatrix.from_csr(cav.K, block=8, dtype=jnp.float64)
    assert abs(B.to_csr() - cav.K).max() < 1e-14


def test_level_schedule_native():
    T = sp.tril(
        sp.random(300, 300, density=0.03, random_state=2) + 2 * sp.eye(300)
    ).tocsr()
    lev, nl = native.level_schedule_levels(T.indptr, T.indices, 300, True)
    # validity: every dependency is on a strictly smaller level
    for i in range(300):
        cs = T.indices[T.indptr[i] : T.indptr[i + 1]]
        for c in cs[cs < i]:
            assert lev[c] < lev[i]
    assert nl == lev.max() + 1
