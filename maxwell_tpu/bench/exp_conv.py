"""Preconditioner-strength sweep at scale (round-2 VERDICT item 10).

The 64^3 stencil solve stalled at residual 2.4e-4 after 60 iterations with
the round-2 settings (alpha=15, 16 CG sweeps): kappa(K + alpha*M) grows as
1/(alpha*h^2), so a FIXED sweep count loses preconditioner quality as the
grid refines. This sweep measures iterations-to-tol and wall time (compile
split out) for (alpha, iters) combinations at a given grid so bench.py can
ship settings that actually converge at 64^3.

Usage: python -m maxwell_tpu.bench.exp_conv [grid [maxiter]]
Writes exp_conv_results.json (merged across grids).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from maxwell_tpu.problems.stencil3d import StencilPencil3D
from maxwell_tpu.solvers import lobpcg
from maxwell_tpu.solvers.precond import shifted_cg_preconditioner


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    maxiter = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    dev = jax.devices()[0]
    print("device", dev, "grid", grid, file=sys.stderr, flush=True)
    stp = StencilPencil3D.build(nx=grid, ny=grid, nz=grid, dtype=jnp.float32)

    combos = [(15.0, 16), (15.0, 32), (15.0, 48), (40.0, 32)]
    res = {}
    path = "exp_conv_results.json"
    if os.path.exists(path):
        with open(path) as f:
            res = json.load(f)
    for alpha, iters in combos:
        key = f"g{grid}_a{alpha:g}_i{iters}"
        pc = shifted_cg_preconditioner(stp, alpha=alpha, iters=iters)
        t0 = time.perf_counter()
        r = lobpcg(stp, nev=5, maxiter=maxiter, tol=2e-6, precond=pc)
        t_total = time.perf_counter() - t0
        t0 = time.perf_counter()
        r2 = lobpcg(stp, nev=5, maxiter=maxiter, tol=2e-6, precond=pc)
        t_run = time.perf_counter() - t0  # jit-cached second call
        hist = [h["max_rel_res"] for h in r2.history]
        it_1e5 = next((i for i, v in enumerate(hist) if v < 1e-5), -1)
        it_tol = next((i for i, v in enumerate(hist) if v < 2e-6), -1)
        res[key] = {
            "grid": grid, "alpha": alpha, "cg_iters": iters,
            "iterations": int(r2.iterations),
            "max_res": float(r2.residuals.max()),
            "converged": bool(r2.converged),
            "iters_to_1e5": it_1e5, "iters_to_2e6": it_tol,
            "compile_s": t_total - t_run, "solve_s": t_run,
        }
        print(key, json.dumps(res[key]), file=sys.stderr, flush=True)
        with open(path, "w") as f:
            json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
