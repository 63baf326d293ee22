"""Distributed thick-restart Lanczos (round-3 VERDICT missing item 5):
the memory-bounded Krylov variant on the simulated 8-device mesh, forced
through multiple restart cycles, vs the dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from maxwell_tpu.dist import make_mesh, partition_problem
from maxwell_tpu.problems import BrickCavity3D, RectCavity2D
from maxwell_tpu.solvers.trlanczos import thick_restart_lanczos_dist

D = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= D
    return make_mesh(D)


def test_trlanczos_dist_direct_3d(mesh):
    """3D cavity, small ncv (forces thick restarts) — eigenvalue parity."""
    cav = BrickCavity3D(nx=6, ny=6, nz=6)
    dp = partition_problem(cav, D, block=8, dtype=jnp.float64)
    nev = 3
    res = thick_restart_lanczos_dist(
        dp, mesh, nev=nev, ncv=12, max_restarts=60, tol=1e-9
    )
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    pos = np.sort(dense[dense > 1e-8])
    # single-vector Krylov spaces hold ONE direction per eigenvalue:
    # compare against the DISTINCT spectrum (degenerate copies collapse)
    distinct = pos[np.concatenate([[True], np.diff(pos) > 1e-6 * pos[1:]])]
    assert res.converged, f"residuals {res.residuals}"
    # iterations > ncv proves at least one restart cycle happened with
    # the basis capped at ncv columns per shard
    assert res.iterations > 12
    np.testing.assert_allclose(
        res.eigenvalues, distinct[:nev], rtol=1e-7
    )


def test_trlanczos_dist_shift_invert_2d(mesh):
    """Interior modes near sigma via the matrix-free MINRES shift-invert
    apply under the same distributed thick-restart loop."""
    cav = RectCavity2D(nx=10, ny=10)
    dp = partition_problem(cav, D, block=8, dtype=jnp.float64)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    pos = np.sort(dense[dense > 1e-8])
    sigma = 0.5 * (pos[2] + pos[3])  # between modes 3 and 4
    res = thick_restart_lanczos_dist(
        dp, mesh, nev=2, ncv=10, max_restarts=30, tol=1e-8,
        mode="shift_invert", sigma=float(sigma),
    )
    want = pos[np.argsort(np.abs(pos - sigma))][:2]
    assert res.converged, f"residuals {res.residuals}"
    np.testing.assert_allclose(
        np.sort(res.eigenvalues), np.sort(want), rtol=1e-7
    )
