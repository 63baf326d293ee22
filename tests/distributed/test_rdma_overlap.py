"""Fused interior-SpMM + remote-DMA halo kernel (round-2 VERDICT item 7):
halo_impl="rdma_overlap" must match the ppermute union path bit-for-bit —
the transfer/compute overlap is enforced INSIDE one Pallas kernel (DMAs
start at chunk 0, awaited at the last chunk), so correctness of the halo
buffer is exactly the sanitizer-analog contract of SURVEY.md §5.2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from maxwell_tpu.dist import make_mesh, partition_problem
from maxwell_tpu.problems import RectCavity2D
from maxwell_tpu.solvers.dist_solve import lobpcg_dist, spmm_dist

D = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= D
    return make_mesh(D)


@pytest.fixture(scope="module")
def pencils():
    cav = RectCavity2D(nx=16, ny=16)
    dp = partition_problem(cav, D, kernel="union", dtype=jnp.float32)
    dpo = partition_problem(
        cav, D, kernel="union", dtype=jnp.float32,
        halo_impl="rdma_overlap",
    )
    assert dpo.H <= dpo.L, "overlap path needs the shallow-halo regime"
    return cav, dp, dpo


def test_overlap_spmm_bit_equal(mesh, pencils):
    _, dp, dpo = pencils
    n_pad_g = dp.D * dp.L * dp.b
    X = jax.random.normal(jax.random.PRNGKey(0), (n_pad_g, 3), jnp.float32)
    for which in ("K", "M"):
        Y0 = np.asarray(spmm_dist(dp, mesh, X, which=which))
        Y1 = np.asarray(spmm_dist(dpo, mesh, X, which=which))
        np.testing.assert_array_equal(Y0, Y1)


def test_overlap_km_bit_equal(mesh, pencils):
    _, dp, dpo = pencils
    n_pad_g = dp.D * dp.L * dp.b
    X = jax.random.normal(jax.random.PRNGKey(1), (n_pad_g, 2), jnp.float32)
    mapped = jax.shard_map(
        lambda p, Xl: p.KM_mm(Xl),
        mesh=mesh,
        in_specs=(dpo.partition_specs(), P(dpo.axis, None)),
        out_specs=(P(dpo.axis, None), P(dpo.axis, None)),
        check_vma=False,
    )
    KX, MX = jax.jit(mapped)(dpo, X)
    np.testing.assert_array_equal(
        np.asarray(KX), np.asarray(spmm_dist(dp, mesh, X, which="K"))
    )
    np.testing.assert_array_equal(
        np.asarray(MX), np.asarray(spmm_dist(dp, mesh, X, which="M"))
    )


def test_overlap_full_solve(mesh, pencils):
    """The whole distributed LOBPCG runs through the fused kernel."""
    import scipy.linalg

    cav, _, dpo = pencils
    res = lobpcg_dist(dpo, mesh, nev=3, maxiter=60, tol=1e-5,
                      precond_alpha=10.0)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:3]
    assert res.converged, f"residuals {res.residuals}"
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-4)
