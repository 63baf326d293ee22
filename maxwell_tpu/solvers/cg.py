"""Conjugate-gradient inner solves, jit-able (fixed-shape `lax.while_loop`).

Used for (a) mass-matrix solves M^-1 r inside the generalized Lanczos operator
and (b) the nodal solve (G^T M G)^-1 inside the gradient-nullspace projector
(SURVEY.md §7.5 hard part 2). Both M and the nodal Laplacian are SPD and
well-conditioned on uniform grids, so plain CG converges in tens of iterations.
All control flow is compiler-friendly: no data-dependent Python branches
(SURVEY.md §7.4 rule 5).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def cg(
    A_mm: Callable[[jax.Array], jax.Array],
    B: jax.Array,
    x0: jax.Array | None = None,
    tol: float = 1e-10,
    maxiter: int = 200,
    dot=None,
) -> jax.Array:
    """Solve A X = B (SPD A, multiple right-hand sides) by CG.

    A_mm: closure computing A @ X for X of shape (n, m) (or (n,)).
    dot: column-wise inner product (x, y) -> (m,); override with a psum-ing
         version under `shard_map` (SURVEY.md §2 C7). Defaults to local.
    Stops when every column residual norm^2 <= tol^2 * ||B||^2, or maxiter.
    """
    if dot is None:
        dot = lambda x, y: jnp.sum(x * y, axis=0)

    vec_in = B.ndim == 1
    if vec_in:
        B = B[:, None]
    X = jnp.zeros_like(B) if x0 is None else (x0[:, None] if vec_in else x0)

    # dtype-aware floor: iterating past the dtype's attainable residual makes
    # fp32 CG explode (noise directions, vanishing denominators)
    eps = float(jnp.finfo(B.dtype).eps)
    tol_eff = max(tol, 16.0 * eps)
    tiny = float(jnp.finfo(B.dtype).tiny) * 1e4

    R = B - A_mm(X)
    P = R
    rs = dot(R, R)
    b2 = jnp.maximum(dot(B, B), jnp.finfo(B.dtype).tiny)

    def cond(state):
        it, X, R, P, rs = state
        return jnp.logical_and(
            it < maxiter, jnp.any(rs > (tol_eff * tol_eff) * b2)
        )

    def body(state):
        it, X, R, P, rs = state
        AP = A_mm(P)
        denom = dot(P, AP)
        # per-column breakdown guard: freeze columns whose search direction
        # has collapsed (denom <= tiny) or that already hit the floor
        live = jnp.logical_and(
            denom > tiny, rs > (tol_eff * tol_eff) * b2
        )
        alpha = jnp.where(live, rs / jnp.where(live, denom, 1.0), 0.0)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        rs_new = dot(R, R)
        beta = jnp.where(
            live, rs_new / jnp.where(rs > 0, rs, 1.0), 0.0
        )
        P = R + beta[None, :] * P
        return it + 1, X, R, P, jnp.where(live, rs_new, rs * 0.0)

    _, X, _, _, _ = jax.lax.while_loop(cond, body, (0, X, R, P, rs))
    return X[:, 0] if vec_in else X
