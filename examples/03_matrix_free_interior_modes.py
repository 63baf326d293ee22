"""Fully matrix-free interior-mode solve: assembly-free stencil operator +
MINRES shift-invert — no sparse matrix is ever formed."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from maxwell_tpu.problems.stencil2d import StencilPencil2D
from maxwell_tpu.solvers.shift_invert import shift_invert_lanczos
import jax.numpy as jnp

stp = StencilPencil2D.build(nx=32, ny=32, dtype=jnp.float64)
res = shift_invert_lanczos(
    stp, sigma=45.0, nev=4, maxiter=30, tol=1e-8, backend="iterative"
)
print("modes near sigma=45:", res.eigenvalues)
