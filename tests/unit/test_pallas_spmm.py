"""Pallas SpMM kernel vs jnp reference (interpret mode on CPU; the same
kernel compiles for TPU — SURVEY.md §4 unit tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxwell_tpu.problems import RectCavity2D
from maxwell_tpu.sparse.bsr import BSRMatrix, bsr_matmat_ref
from maxwell_tpu.kernels.spmm import bsr_matmat_pallas


@pytest.fixture(scope="module")
def fem_bsr():
    cav = RectCavity2D(nx=16, ny=16)
    return BSRMatrix.from_csr(cav.K, block=8, dtype=jnp.float32)


def test_pallas_spmm_matches_ref(fem_bsr):
    A = fem_bsr
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (A.n_padded, 8), jnp.float32)
    Y_ref = bsr_matmat_ref(A, X)
    Y = bsr_matmat_pallas(A, X, interpret=True)
    np.testing.assert_allclose(
        np.asarray(Y), np.asarray(Y_ref), rtol=1e-5, atol=1e-5
    )


def test_pallas_spmm_wide_block(fem_bsr):
    A = fem_bsr
    key = jax.random.PRNGKey(1)
    X = jax.random.normal(key, (A.n_padded, 16), jnp.float32)
    Y_ref = bsr_matmat_ref(A, X)
    Y = bsr_matmat_pallas(A, X, interpret=True)
    np.testing.assert_allclose(
        np.asarray(Y), np.asarray(Y_ref), rtol=1e-5, atol=1e-5
    )


def test_pallas_windowed_matches_ref(fem_bsr):
    from maxwell_tpu.kernels.spmm import bsr_matmat_pallas_windowed

    A = fem_bsr
    assert A.win_start is not None and A.win_unit > 0
    key = jax.random.PRNGKey(2)
    X = jax.random.normal(key, (A.n_padded, 8), jnp.float32)
    Y_ref = bsr_matmat_ref(A, X)
    Y = bsr_matmat_pallas_windowed(A, X, interpret=True)
    np.testing.assert_allclose(
        np.asarray(Y), np.asarray(Y_ref), rtol=1e-5, atol=1e-5
    )


def test_pallas_windowed_3d_rcm():
    """Windowed kernel on an RCM-ordered 3D operator (realistic bandwidth)."""
    from maxwell_tpu.kernels.spmm import bsr_matmat_pallas_windowed
    from maxwell_tpu.problems import BrickCavity3D
    from maxwell_tpu.sparse.reorder import PermutedProblem

    cav = PermutedProblem(BrickCavity3D(nx=6, ny=6, nz=6))
    A = BSRMatrix.from_csr(cav.K, block=8, dtype=jnp.float32)
    assert A.win_start is not None
    key = jax.random.PRNGKey(3)
    X = jax.random.normal(key, (A.n_padded, 8), jnp.float32)
    Y_ref = bsr_matmat_ref(A, X)
    Y = bsr_matmat_pallas_windowed(A, X, interpret=True)
    np.testing.assert_allclose(
        np.asarray(Y), np.asarray(Y_ref), rtol=1e-4, atol=1e-4
    )
