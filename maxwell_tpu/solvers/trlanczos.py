"""Thick-restart Lanczos (Wu-Simon / Krylov-Schur class) — memory-bounded
Krylov eigensolver (SURVEY.md §2 C9 family).

Plain Lanczos needs a basis as large as the Krylov space (maxiter columns);
for the smallest modes of stiff pencils that can approach n. Thick restart
caps the basis at `ncv` columns: after each cycle, the basis collapses to
the `nkeep` best Ritz vectors plus the last Lanczos vector, the projected
matrix becomes an arrowhead, and expansion continues. Memory is O(n*ncv)
regardless of total iterations.

Implementation notes:
- Works in the M-inner product on the abstract pencil operator (direct mode
  P M^-1 K, or any M-self-adjoint apply such as shift-invert).
- Full two-pass reorthogonalization; the projected matrix H is maintained
  DENSE (ncv x ncv) — robust to the arrowhead structure and roundoff.
- Expansion steps are jit-ed (operator apply + Gram + update in one fused
  call); the small RR/eigh runs on host between cycles.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from maxwell_tpu.solvers.lanczos import _direct_apply, _project_apply
from maxwell_tpu.solvers.results import EigenResult


from maxwell_tpu.utils.precision import fp32_true

@jax.jit
def _expand_step(apply_op, pencil, V, MV, j, post=None):
    """One Krylov expansion step from basis column j-1 (j TRACED — one
    compile regardless of basis position; review finding round 1).

    Returns (V, MV updated with column j, h projection coeffs, beta).
    V/MV: (ncv+1, n) row-major basis buffers (rows >= j are zero).
    """
    w = apply_op(jax.lax.dynamic_index_in_dim(V, j - 1, keepdims=False))
    # projection coefficients BEFORE orthogonalization: h = (MV)^T w
    h = pencil.reduce_rows(MV @ pencil.weigh(w))  # (ncv+1,), rows>=j zero

    def reorth(w):
        c = pencil.reduce_rows(MV @ pencil.weigh(w))
        return w - V.T @ c, c

    w, c1 = reorth(w)
    w, _ = reorth(w)
    if post is not None:
        # nullspace hygiene: roundoff resurrects gradient components
        w = post(w)

    Mw = pencil.M_mm(w)
    beta = jnp.sqrt(jnp.maximum(pencil.dot_vv(w, Mw), 0.0))
    safe = jnp.where(beta > 0, beta, 1.0)
    V = jax.lax.dynamic_update_index_in_dim(V, w / safe, j, 0)
    MV = jax.lax.dynamic_update_index_in_dim(MV, Mw / safe, j, 0)
    return V, MV, h, beta


@fp32_true
def thick_restart_lanczos(
    pencil,
    nev: int = 5,
    ncv: int | None = None,
    max_restarts: int = 40,
    tol: float = 1e-8,
    key: jax.Array | None = None,
    apply_op: Callable | None = None,
    mode: str = "direct",
    sigma: float = 0.0,
) -> EigenResult:
    """Smallest (direct) or nearest-sigma (shift_invert apply_op) eigenpairs
    with an O(n*ncv) memory cap. ncv default: max(2*nev+10, 20)."""
    if ncv is None:
        ncv = max(2 * nev + 10, 20)
    if key is None:
        key = jax.random.PRNGKey(0)
    n_pad = pencil.n_padded
    dtype = pencil.dtype

    if apply_op is None:
        if mode != "direct":
            raise ValueError("supply apply_op for non-direct modes")
        apply_op = jax.tree_util.Partial(_direct_apply, pencil)
    post = jax.tree_util.Partial(_project_apply, pencil)

    v0 = jax.random.normal(key, (n_pad,), dtype=dtype)
    v0 = post(v0)
    Mv0 = pencil.M_mm(v0)
    nrm = jnp.sqrt(pencil.dot_vv(v0, Mv0))
    V = jnp.zeros((ncv + 1, n_pad), dtype).at[0].set(v0 / nrm)
    MV = jnp.zeros((ncv + 1, n_pad), dtype).at[0].set(Mv0 / nrm)

    H = np.zeros((ncv + 1, ncv + 1))
    j = 1  # number of valid basis columns
    total_iters = 0
    converged = False
    theta = np.zeros(nev)

    for cycle in range(max_restarts):
        # --- expand to ncv columns -------------------------------------
        while j <= ncv:
            V, MV, h, beta = _expand_step(apply_op, pencil, V, MV, j, post)
            hj = np.asarray(h)[:j]
            H[:j, j - 1] = hj
            H[j - 1, :j] = hj  # M-self-adjoint operator => symmetric H
            b = float(beta)
            H[j, j - 1] = b
            H[j - 1, j] = b
            total_iters += 1
            j += 1

        # --- Rayleigh-Ritz on the dense projected matrix ----------------
        Hs = 0.5 * (H[:ncv, :ncv] + H[:ncv, :ncv].T)
        w_, S = np.linalg.eigh(Hs)
        if mode == "direct":
            # nullspace junk (lambda ~ 0, resurrected by roundoff) sorts to
            # the END so selection/restart keeps only physical modes
            theta_max = max(np.abs(w_).max(), 1.0)
            bad = w_ <= 1e-8 * theta_max
            sel = np.argsort(w_ + bad * 1e3 * theta_max)
        else:
            sel = np.argsort(-np.abs(w_))
        w_, S = w_[sel], S[:, sel]

        beta_last = H[ncv, ncv - 1]
        resid_est = np.abs(beta_last * S[ncv - 1, :])
        scale = np.maximum(np.abs(w_), 1e-30)
        conv_mask = resid_est <= tol * scale
        if mode == "direct":
            # never declare convergence on nullspace junk that slipped into
            # the first nev slots (review finding round 1)
            theta_max2 = max(np.abs(w_).max(), 1.0)
            n_good = int((w_ > 1e-8 * theta_max2).sum())
            if n_good >= nev and conv_mask[:nev].all():
                converged = True
        elif conv_mask[:nev].all():
            converged = True
        theta = w_[:nev]

        nkeep = min(nev + max(5, nev // 2), ncv - 2)
        if converged or cycle == max_restarts - 1:
            nkeep = max(nkeep, nev)
            Sk = jnp.asarray(S[:, :nkeep], dtype=dtype)
            X = V[:ncv].T @ Sk
            MX = MV[:ncv].T @ Sk
            break

        # --- thick restart: collapse to nkeep Ritz vectors + last v -----
        Sk = jnp.asarray(S[:, :nkeep], dtype=dtype)
        Vk = (V[:ncv].T @ Sk).T  # (nkeep, n)
        MVk = (MV[:ncv].T @ Sk).T
        v_last = V[ncv]
        Mv_last = MV[ncv]
        V = jnp.zeros_like(V).at[:nkeep].set(Vk).at[nkeep].set(v_last)
        MV = jnp.zeros_like(MV).at[:nkeep].set(MVk).at[nkeep].set(Mv_last)
        H = np.zeros((ncv + 1, ncv + 1))
        H[:nkeep, :nkeep] = np.diag(w_[:nkeep])
        coup = beta_last * S[ncv - 1, :nkeep]
        H[nkeep, :nkeep] = coup
        H[:nkeep, nkeep] = coup
        j = nkeep + 1

    # --- extract ---------------------------------------------------------
    lams = theta if mode == "direct" else sigma + 1.0 / theta
    if mode == "shift_invert":
        order = np.argsort(lams[:nev])
        lams = lams[order]
        X = X[:, order]
        MX = MX[:, order]
    lam_d = jnp.asarray(lams[:nev], dtype=dtype)
    Xn = X[:, :nev]
    KX = pencil.K_mm(Xn)
    MXn = pencil.M_mm(Xn)
    R = KX - MXn * lam_d[None, :]
    scale = pencil.col_norms(KX) + jnp.abs(lam_d) * pencil.col_norms(MXn)
    res = np.asarray(pencil.col_norms(R) / jnp.maximum(scale, 1e-30))

    n = pencil.n
    return EigenResult(
        eigenvalues=np.asarray(lams[:nev]),
        eigenvectors=np.asarray(Xn[:n]),
        residuals=res,
        iterations=total_iters,
        converged=bool(np.all(res <= 10 * tol)),
    )


@fp32_true
def thick_restart_lanczos_dist(
    dpencil,
    mesh,
    nev: int = 5,
    ncv: int | None = None,
    max_restarts: int = 40,
    tol: float = 1e-8,
    key: jax.Array | None = None,
    mode: str = "direct",
    sigma: float = 0.0,
    inner_tol: float = 1e-11,
    inner_iters: int = 400,
) -> EigenResult:
    """DISTRIBUTED thick-restart Lanczos (round-3 VERDICT missing item 5):
    the memory-bounded O(n*ncv) Krylov variant at pod scale.

    Same host-orchestrated cycle structure as thick_restart_lanczos; the
    jitted expansion step runs under shard_map (the DistPencil's
    reduce_rows/dot_vv psum, halos ride the pencil's exchange), so the
    basis cap — the whole point of thick restart — applies PER SHARD:
    memory is O(n_local * ncv) per device. Basis collapse and the dense
    (ncv x ncv) Rayleigh-Ritz stay on host between cycles (tiny).

    mode="shift_invert" uses the matrix-free MINRES inner solve (the same
    operator as shift_invert_lanczos_dist)."""
    from jax.sharding import PartitionSpec as P

    if ncv is None:
        ncv = max(2 * nev + 10, 20)
    if key is None:
        key = jax.random.PRNGKey(0)
    axis = dpencil.axis
    dtype = dpencil.dtype
    n_glob = dpencil.global_rows

    def _mk_apply(p):
        if mode == "direct":
            return jax.tree_util.Partial(_direct_apply, p)
        from maxwell_tpu.solvers.shift_invert import _si_apply_iterative

        return jax.tree_util.Partial(
            _si_apply_iterative, p, sigma, inner_tol, inner_iters
        )

    def _init_local(p, v):
        post = jax.tree_util.Partial(_project_apply, p)
        v = post(v)
        Mv = p.M_mm(v)
        nrm = jnp.sqrt(jnp.maximum(p.dot_vv(v, Mv), 1e-300))
        return v / nrm, Mv / nrm

    init = jax.jit(
        jax.shard_map(
            _init_local, mesh=mesh,
            in_specs=(dpencil.partition_specs(), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    )

    def _step_local(p, V, MV, j):
        apply_op = _mk_apply(p)
        post = jax.tree_util.Partial(_project_apply, p)
        return _expand_step(apply_op, p, V, MV, j, post)

    step = jax.jit(
        jax.shard_map(
            _step_local, mesh=mesh,
            in_specs=(
                dpencil.partition_specs(), P(None, axis), P(None, axis),
                P(),
            ),
            out_specs=(P(None, axis), P(None, axis), P(), P()),
            check_vma=False,
        )
    )

    v0 = dpencil.make_block(key, 1)[:, 0]
    v0n, Mv0n = init(dpencil, v0)
    V = jnp.zeros((ncv + 1, n_glob), dtype).at[0].set(v0n)
    MV = jnp.zeros((ncv + 1, n_glob), dtype).at[0].set(Mv0n)

    H = np.zeros((ncv + 1, ncv + 1))
    j = 1
    total_iters = 0
    converged = False
    theta = np.zeros(nev)

    for cycle in range(max_restarts):
        while j <= ncv:
            V, MV, h, beta = step(dpencil, V, MV, jnp.int32(j))
            hj = np.asarray(h)[:j]
            H[:j, j - 1] = hj
            H[j - 1, :j] = hj
            b = float(beta)
            H[j, j - 1] = b
            H[j - 1, j] = b
            total_iters += 1
            j += 1

        Hs = 0.5 * (H[:ncv, :ncv] + H[:ncv, :ncv].T)
        w_, S = np.linalg.eigh(Hs)
        if mode == "direct":
            theta_max = max(np.abs(w_).max(), 1.0)
            bad = w_ <= 1e-8 * theta_max
            sel = np.argsort(w_ + bad * 1e3 * theta_max)
        else:
            sel = np.argsort(-np.abs(w_))
        w_, S = w_[sel], S[:, sel]

        beta_last = H[ncv, ncv - 1]
        resid_est = np.abs(beta_last * S[ncv - 1, :])
        scale = np.maximum(np.abs(w_), 1e-30)
        conv_mask = resid_est <= tol * scale
        if mode == "direct":
            theta_max2 = max(np.abs(w_).max(), 1.0)
            n_good = int((w_ > 1e-8 * theta_max2).sum())
            if n_good >= nev and conv_mask[:nev].all():
                converged = True
        elif conv_mask[:nev].all():
            converged = True
        theta = w_[:nev]

        nkeep = min(nev + max(5, nev // 2), ncv - 2)
        if converged or cycle == max_restarts - 1:
            nkeep = max(nkeep, nev)
            Sk = jnp.asarray(S[:, :nkeep], dtype=dtype)
            X = V[:ncv].T @ Sk
            break

        Sk = jnp.asarray(S[:, :nkeep], dtype=dtype)
        Vk = (V[:ncv].T @ Sk).T
        MVk = (MV[:ncv].T @ Sk).T
        v_last = V[ncv]
        Mv_last = MV[ncv]
        V = jnp.zeros_like(V).at[:nkeep].set(Vk).at[nkeep].set(v_last)
        MV = jnp.zeros_like(MV).at[:nkeep].set(MVk).at[nkeep].set(Mv_last)
        H = np.zeros((ncv + 1, ncv + 1))
        H[:nkeep, :nkeep] = np.diag(w_[:nkeep])
        coup = beta_last * S[ncv - 1, :nkeep]
        H[nkeep, :nkeep] = coup
        H[:nkeep, nkeep] = coup
        j = nkeep + 1

    lams = theta if mode == "direct" else sigma + 1.0 / theta
    Xn = X[:, :nev]
    if mode == "shift_invert":
        order = np.argsort(lams[:nev])
        lams = lams[:nev][order]
        Xn = Xn[:, order]
    from maxwell_tpu.solvers.dist_solve import _dist_residuals

    res = _dist_residuals(dpencil, mesh, Xn, np.asarray(lams[:nev]))
    vecs = dpencil.extract_vectors(np.asarray(Xn))
    return EigenResult(
        eigenvalues=np.asarray(lams[:nev]),
        eigenvectors=vecs,
        residuals=res,
        iterations=total_iters,
        converged=bool(np.all(res <= 10 * tol)),
    )
