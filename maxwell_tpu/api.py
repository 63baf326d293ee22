"""Top-level convenience API: solve a cavity eigenproblem in one call with
sensible defaults (SURVEY.md §2 C17 — the library-facing driver).

    import maxwell_tpu
    res = maxwell_tpu.solve(RectCavity2D(nx=64, ny=64), nev=10)
"""

from __future__ import annotations

import jax.numpy as jnp


from maxwell_tpu.utils.precision import fp32_true

@fp32_true
def solve(
    problem,
    nev: int = 5,
    tol: float = 1e-8,
    solver: str = "lobpcg",
    sigma: float | None = None,
    maxiter: int | None = None,
    dtype=jnp.float64,
    block: int | None = None,
    kernel: str = "ref",
    distributed: bool = False,
    n_shards: int | None = None,
    **kwargs,
):
    """Solve K x = lambda M x for `problem` (RectCavity2D / BrickCavity3D /
    PermutedProblem).

    solver: "lobpcg" (default; preconditioned, alpha auto-tuned from the
    analytic oracle when available), "lanczos", or "shift_invert" (needs
    sigma). kernel: "ref" (XLA einsum) or "pallas" (TPU kernels).
    distributed=True shards over all visible devices (or n_shards).
    """
    if dtype == jnp.float64:
        import jax

        jax.config.update("jax_enable_x64", True)

    # auto preconditioner shift: the scale of the smallest wanted mode
    alpha = kwargs.pop("precond_alpha", None)
    if alpha is None:
        try:
            alpha = float(problem.analytic_eigenvalues(1)[0])
        except Exception:
            alpha = 1.0

    if distributed:
        import jax

        from maxwell_tpu.dist import make_mesh, partition_problem
        from maxwell_tpu.solvers.dist_solve import lobpcg_dist

        if solver != "lobpcg":
            raise ValueError("distributed convenience path is LOBPCG-only")
        D = n_shards or len(jax.devices())
        dp = partition_problem(
            problem, D, block=block, kernel=kernel, dtype=dtype
        )
        mesh = make_mesh(D)
        return lobpcg_dist(
            dp, mesh, nev=nev, maxiter=maxiter or 200, tol=tol,
            precond_alpha=alpha, **kwargs,
        )

    from maxwell_tpu.solvers.operator import Pencil

    pencil = Pencil.from_problem(
        problem, block=block, kernel=kernel, dtype=dtype
    )
    if solver == "lobpcg":
        from maxwell_tpu.solvers import lobpcg
        from maxwell_tpu.solvers.precond import shifted_cg_preconditioner

        pc = shifted_cg_preconditioner(pencil, alpha=alpha, iters=20)
        return lobpcg(
            pencil, nev=nev, maxiter=maxiter or 200, tol=tol, precond=pc,
            **kwargs,
        )
    if solver == "lanczos":
        from maxwell_tpu.solvers import lanczos

        return lanczos(
            pencil, nev=nev, maxiter=maxiter or 300, tol=tol, **kwargs
        )
    if solver == "shift_invert":
        if sigma is None:
            raise ValueError("shift_invert needs sigma")
        from maxwell_tpu.solvers.shift_invert import shift_invert_lanczos

        return shift_invert_lanczos(
            pencil, sigma=sigma, nev=nev, maxiter=maxiter or 60, tol=tol,
            **kwargs,
        )
    raise ValueError(f"unknown solver {solver!r}")
