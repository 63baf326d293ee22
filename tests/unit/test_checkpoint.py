"""Checkpoint/resume (SURVEY.md §5.4): LOBPCG restarts from the saved Ritz
block and converges in far fewer iterations."""

import os

import jax.numpy as jnp
import numpy as np

from maxwell_tpu.problems import RectCavity2D
from maxwell_tpu.solvers import Pencil, lobpcg
from maxwell_tpu.solvers.precond import shifted_cg_preconditioner
from maxwell_tpu.utils.checkpoint import load_state, save_state


def test_save_load_roundtrip(tmp_path):
    p = str(tmp_path / "state.npz")
    X = np.random.default_rng(0).standard_normal((40, 3))
    save_state(p, X=X, theta=np.array([1.0, 2.0, 3.0]), iteration=7)
    s = load_state(p)
    np.testing.assert_array_equal(s["X"], X)
    assert s["iteration"] == 7
    assert load_state(str(tmp_path / "missing.npz")) is None


def test_lobpcg_resume(tmp_path):
    cav = RectCavity2D(nx=16, ny=16)
    pencil = Pencil.from_problem(cav, block=8, dtype=jnp.float64)
    pc = shifted_cg_preconditioner(pencil, alpha=10.0, iters=20)
    ckpt = str(tmp_path / "lobpcg.npz")

    # phase 1: partial solve, interrupted after few iterations
    r1 = lobpcg(pencil, nev=4, maxiter=5, tol=1e-9, precond=pc, checkpoint=ckpt)
    assert os.path.exists(ckpt)
    assert not r1.converged

    # phase 2: resume — should converge quickly from the saved block
    r2 = lobpcg(
        pencil, nev=4, maxiter=40, tol=1e-9, precond=pc, checkpoint=ckpt
    )
    assert r2.converged
    assert r2.iterations > 5  # counted cumulatively across the restart
    resumed_iters = r2.iterations - r1.iterations
    # cold start takes ~17+ iterations; resumed should be clearly fewer
    assert resumed_iters < 17, resumed_iters


def test_inloop_checkpoint_and_recovery(tmp_path):
    """In-loop periodic saves (round-1 VERDICT item 8): a run that stops
    mid-solve (maxiter cap simulates a kill) leaves a usable snapshot; a
    fresh solve resumes from it instead of starting over."""
    cav = RectCavity2D(nx=16, ny=16)
    pencil = Pencil.from_problem(cav, block=8, dtype=jnp.float64)
    pc = shifted_cg_preconditioner(pencil, alpha=10.0, iters=20)
    ckpt = str(tmp_path / "inloop.npz")

    partial = lobpcg(
        pencil, nev=4, maxiter=6, tol=1e-12, precond=pc,
        checkpoint=ckpt, checkpoint_every=2,
    )
    assert not partial.converged
    s = load_state(ckpt)
    assert s is not None
    # in-loop snapshots are written every 2 iterations DURING the loop;
    # the exit-time save then overwrites with the final block
    assert s["iteration"] == partial.iterations

    resumed = lobpcg(
        pencil, nev=4, maxiter=60, tol=1e-10, precond=pc,
        checkpoint=ckpt, checkpoint_every=2,
    )
    assert resumed.converged
    assert resumed.iterations > partial.iterations  # counted cumulatively


def test_inloop_checkpoint_padded_snapshot_resume(tmp_path):
    """A snapshot written ONLY by the in-loop callback (padded rows) must
    resume cleanly — simulated by disabling the exit-time overwrite via a
    direct lobpcg_run call."""
    import jax

    from maxwell_tpu.solvers.lobpcg import lobpcg_run

    cav = RectCavity2D(nx=16, ny=16)
    pencil = Pencil.from_problem(cav, block=8, dtype=jnp.float64)
    ckpt = str(tmp_path / "padded.npz")
    key = jax.random.PRNGKey(0)
    X0 = jax.random.normal(key, (pencil.n_padded, 4), pencil.dtype)
    X0 = pencil.project(X0.at[pencil.n :].set(0.0))
    lobpcg_run(
        pencil, X0, 5, 1e-12, None, nev=4,
        checkpoint_every=2, checkpoint_path=ckpt,
    )
    s = load_state(ckpt)
    assert s is not None and s["X"].shape[0] == pencil.n_padded
    pc = shifted_cg_preconditioner(pencil, alpha=10.0, iters=20)
    res = lobpcg(pencil, nev=4, maxiter=80, tol=1e-9, precond=pc,
                 checkpoint=ckpt)
    assert res.converged
    assert res.iterations > 4  # prev_iters carried over from the snapshot


def test_dist_inloop_shard_snapshots(tmp_path):
    """Distributed in-loop saves write one file per shard; the loader
    reassembles the stacked block and lobpcg_dist resumes from it."""
    import jax

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    from maxwell_tpu.dist import make_mesh, partition_problem
    from maxwell_tpu.problems import BrickCavity3D
    from maxwell_tpu.solvers.dist_solve import lobpcg_dist
    from maxwell_tpu.utils.checkpoint import load_sharded_state

    cav = BrickCavity3D(nx=6, ny=6, nz=6)
    dp = partition_problem(cav, 8, block=8, dtype=jnp.float64)
    mesh = make_mesh(8)
    ckpt = str(tmp_path / "dist.npz")
    partial = lobpcg_dist(
        dp, mesh, nev=4, maxiter=5, tol=1e-12, precond_alpha=15.0,
        checkpoint=ckpt, checkpoint_every=2,
    )
    assert not partial.converged
    ss = load_sharded_state(ckpt, dp.D)
    assert ss is not None
    assert ss["X"].shape[0] == dp.D * dp.L * dp.b
    # remove the exit-time global file: resume must use the shard files
    os.unlink(ckpt)
    resumed = lobpcg_dist(
        dp, mesh, nev=4, maxiter=120, tol=1e-9, precond_alpha=15.0,
        checkpoint=ckpt, checkpoint_every=0,
    )
    assert resumed.converged
    assert resumed.iterations > partial.iterations
