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
