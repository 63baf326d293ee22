"""BASELINE.json config 4: 3D Nedelec cavity, row-partitioned SpMV with halo
exchange on a (simulated 8-device) mesh — sharded-vs-single parity and full
distributed eigensolve (SURVEY.md §4 distributed tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from maxwell_tpu.dist import make_mesh, partition_problem
from maxwell_tpu.problems import BrickCavity3D, RectCavity2D
from maxwell_tpu.solvers import Pencil
from maxwell_tpu.solvers.dist_solve import lobpcg_dist, spmm_dist

D = 8


@pytest.fixture(scope="module")
def cav3d():
    return BrickCavity3D(nx=6, ny=6, nz=6)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= D, "conftest must force 8 CPU devices"
    return make_mesh(D)


@pytest.mark.parametrize("reorder", [False, True])
def test_sharded_spmm_parity(cav3d, mesh, reorder):
    """Row-partitioned SpMM with halo exchange == single-device SpMM.

    reorder=False exercises the deep-halo all_gather fallback (raw edge
    numbering has near-full bandwidth on this tiny grid); reorder=True
    exercises the RCM + neighbor-ppermute fast path."""
    dp = partition_problem(cav3d, D, block=8, dtype=jnp.float64, reorder=reorder)
    single = Pencil.from_problem(cav3d, block=8, dtype=jnp.float64)
    n = cav3d.n_edges
    key = jax.random.PRNGKey(0)
    n_pad_g = dp.D * dp.L * dp.b
    X = jax.random.normal(key, (n_pad_g, 4), dtype=jnp.float64)
    X = X.at[n:].set(0.0)

    # single-device oracle works in the ORIGINAL ordering
    perm = dp.perm if reorder else np.arange(n)
    Xs_np = np.zeros((single.n_padded, 4))
    Xs_np[perm] = np.asarray(X[:n])  # X rows are in permuted ordering
    Y_single = np.asarray(single.K_mm(jnp.asarray(Xs_np)))[:n]
    Y_dist = np.asarray(spmm_dist(dp, mesh, X, which="K"))[:n]
    np.testing.assert_allclose(Y_dist, Y_single[perm], rtol=1e-12, atol=1e-12)

    Y_single_M = np.asarray(single.M_mm(jnp.asarray(Xs_np)))[:n]
    Y_dist_M = np.asarray(spmm_dist(dp, mesh, X, which="M"))[:n]
    np.testing.assert_allclose(
        Y_dist_M, Y_single_M[perm], rtol=1e-12, atol=1e-12
    )


def test_dist_lobpcg_3d(cav3d, mesh):
    """Full distributed eigensolve on the 3D cavity vs dense oracle."""
    dp = partition_problem(cav3d, D, block=8, dtype=jnp.float64)
    res = lobpcg_dist(
        dp, mesh, nev=3, maxiter=60, tol=1e-8, precond_alpha=15.0
    )
    dense = scipy.linalg.eigh(
        cav3d.K.toarray(), cav3d.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:3]
    assert res.converged, f"residuals {res.residuals}"
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-7)
    # analytic sanity: first 3D mode cluster is 2*pi^2 (triple degenerate)
    np.testing.assert_allclose(
        res.eigenvalues, cav3d.analytic_eigenvalues(3), rtol=5e-2
    )


def test_dist_lobpcg_20_eigenpairs_2d(mesh):
    """BASELINE config-5 workload shape: deflated 20-eigenpair block solve on
    the (simulated) multi-host mesh; parity vs dense oracle."""
    cav = RectCavity2D(nx=16, ny=16)
    dp = partition_problem(cav, D, block=8, dtype=jnp.float64)
    res = lobpcg_dist(
        dp, mesh, nev=20, m=26, maxiter=200, tol=1e-8, precond_alpha=10.0
    )
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:20]
    assert res.converged, f"max res {res.residuals.max():.2e}"
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-6)


def test_dist_lobpcg_incremental_locking(mesh):
    """Round-3 VERDICT item 4: INCREMENTAL deflated multi-eigenpair solve
    at distributed scale — two stages of 10 with the first stage's block
    hard-locked (deflate_Q inside the sharded loop) while the second
    stage iterates a 14-wide active block instead of 26."""
    cav = RectCavity2D(nx=16, ny=16)
    dp = partition_problem(cav, D, block=8, dtype=jnp.float64)
    res = lobpcg_dist(
        dp, mesh, nev=20, batch=10, maxiter=200, tol=1e-8,
        precond_alpha=10.0,
    )
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:20]
    assert res.converged, f"max res {res.residuals.max():.2e}"
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-6)
    stages = {h.get("stage") for h in res.history}
    assert stages == {0, 1}, f"expected two locking stages, got {stages}"


def test_dist_lobpcg_deflate_Q_continues_spectrum(mesh):
    """deflate_Q at distributed scale: a second solve above a locked block
    returns the NEXT eigenvalues, not the locked ones."""
    cav = RectCavity2D(nx=12, ny=12)
    dp = partition_problem(cav, D, block=8, dtype=jnp.float64)
    r1 = lobpcg_dist(
        dp, mesh, nev=4, maxiter=120, tol=1e-9, precond_alpha=10.0
    )
    assert r1.converged
    r2 = lobpcg_dist(
        dp, mesh, nev=4, maxiter=120, tol=1e-9, precond_alpha=10.0,
        deflate_Q=r1.eigenvectors,
    )
    assert r2.converged
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:8]
    np.testing.assert_allclose(r1.eigenvalues, discrete[:4], rtol=1e-7)
    np.testing.assert_allclose(r2.eigenvalues, discrete[4:], rtol=1e-7)


@pytest.mark.parametrize("dim", ["2d", "3d"])
def test_halo_checksum_mode(cav3d, mesh, dim):
    """SURVEY.md §5.2 sanitizer analog: fast halo path == gather oracle.
    2d exercises the shallow-halo ppermute path (H<=L); 3d the deep-halo
    fallback."""
    from jax.sharding import PartitionSpec as P

    prob = RectCavity2D(nx=16, ny=16) if dim == "2d" else cav3d
    dp = partition_problem(prob, D, block=8, dtype=jnp.float64)
    if dim == "2d":
        assert dp.H <= dp.L, "expected the ppermute fast path"
    n_pad_g = dp.D * dp.L * dp.b
    X = jax.random.normal(jax.random.PRNGKey(7), (n_pad_g, 3), jnp.float64)

    body = lambda p, Xl: p.halo_checksum(Xl)
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(dp.partition_specs(), P(dp.axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    err = float(jax.jit(mapped)(dp, X))
    assert err == 0.0, f"halo mismatch {err}"


def test_dist_lanczos_2d(mesh):
    """Distributed Lanczos (same factorization loop, shard_mapped)."""
    from maxwell_tpu.solvers.dist_solve import lanczos_dist

    cav = RectCavity2D(nx=16, ny=16)
    dp = partition_problem(cav, D, block=8, dtype=jnp.float64)
    res = lanczos_dist(dp, mesh, nev=5, maxiter=260, tol=1e-8)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:5]
    assert res.converged, f"residuals {res.residuals}"
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-8)


def test_dist_lobpcg_checkpoint_resume(mesh, tmp_path):
    from maxwell_tpu.solvers.dist_solve import lobpcg_dist

    cav = RectCavity2D(nx=16, ny=16)
    dp = partition_problem(cav, D, block=8, dtype=jnp.float64)
    ckpt = str(tmp_path / "dist.npz")
    r1 = lobpcg_dist(
        dp, mesh, nev=4, maxiter=12, tol=1e-9, precond_alpha=10.0,
        checkpoint=ckpt,
    )
    assert not r1.converged
    r2 = lobpcg_dist(
        dp, mesh, nev=4, maxiter=40, tol=1e-9, precond_alpha=10.0,
        checkpoint=ckpt,
    )
    assert r2.converged
    # cold start needs ~17-20 iterations; resuming from a 12-iteration
    # block (P direction lost) must clearly beat that
    assert r2.iterations - r1.iterations < 12
