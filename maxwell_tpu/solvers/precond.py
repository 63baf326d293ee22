"""Preconditioners for the LOBPCG correction equation (SURVEY.md §3.3 "W =
precond(R)" — optional in the reference; first-class here because the
unpreconditioned curl-curl pencil has kappa ~ 1/h^2 and LOBPCG iteration
count scales with sqrt(kappa)).

`shifted_cg_preconditioner`: W ~ (K + alpha M)^-1 R via a FIXED number of CG
sweeps. K + alpha M is SPD for alpha > 0 (K is PSD with gradient nullspace;
alpha M fills it), and the fixed sweep count keeps the preconditioner close
to a fixed linear operator, which LOBPCG tolerates well. Everything is
jit-able and built from the same SpMM/dot primitives as the solver, so the
distributed variants come for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from maxwell_tpu.solvers.cg import cg
from maxwell_tpu.solvers.operator import Pencil


def _shifted_apply(pencil: Pencil, alpha, Z):
    KZ, MZ = pencil.KM_mm(Z)  # deterministically-ordered collective pair
    return KZ + alpha * MZ


def _precond_apply(pencil: Pencil, alpha, iters: int, R: jax.Array):
    A_mm = jax.tree_util.Partial(_shifted_apply, pencil, alpha)
    # fixed sweep: tol=0 disables the early exit so the operator is the same
    # polynomial in (K + alpha M) at every outer iteration. Dots must be the
    # pencil's (psum-ing under shard_map — row-sharded vectors).
    return cg(A_mm, R, tol=0.0, maxiter=iters, dot=pencil.dot_cols)


def shifted_cg_preconditioner(
    pencil: Pencil, alpha: float = 1.0, iters: int = 20
):
    """Return a Partial suitable for lobpcg(..., precond=...).

    alpha: spectral shift; pick ~ the scale of the smallest wanted
    eigenvalue (e.g. the analytic lowest cavity mode).
    iters: fixed CG sweep count per application.
    """
    return jax.tree_util.Partial(_precond_apply, pencil, alpha, iters)
