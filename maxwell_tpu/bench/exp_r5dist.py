"""Round-5 chip probe: DISTRIBUTED device-resident solve->refine chain
(mesh-of-1 on the real chip) — round-4 VERDICT item 1's "done" gate:
dist_time_to_1e8_64 within 1.5x of the single-device number.

Usage: timeout 2400 python -m maxwell_tpu.bench.exp_r5dist [grid]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import jax
    import jax.numpy as jnp

    from maxwell_tpu.dist import make_mesh
    from maxwell_tpu.dist.stencil_dist import DistStencilPencil3D
    from maxwell_tpu.solvers.dist_solve import lobpcg_dist
    from maxwell_tpu.solvers.refine_device import refine_dw_dist

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    out = {"grid": grid}

    mesh1 = make_mesh(1)
    dsp = DistStencilPencil3D.build(
        nx=grid, ny=grid, nz=grid, D=1, dtype=jnp.float32
    )
    kwd = dict(nev=5, maxiter=40, tol=2e-6, precond="spectral",
               precond_alpha=15.0, stall_window=10, return_device=True)

    t0 = time.perf_counter()
    resd = lobpcg_dist(dsp, mesh1, **kwd)
    cold = time.perf_counter() - t0
    solves = []
    for _ in range(3):
        t0 = time.perf_counter()
        resd = lobpcg_dist(dsp, mesh1, **kwd)
        solves.append(time.perf_counter() - t0)
    out["solve_cold_s"] = cold
    out["solve_steady_s"] = sorted(solves)
    out["solve_iters"] = int(resd.iterations)
    out["solve_res"] = float(resd.residuals.max())
    print(f"dist solve: cold {cold:.2f}s steady {sorted(solves)}",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    ref = refine_dw_dist(dsp, mesh1, resd.eigenvectors, tol=1e-8,
                         return_device=True)
    refc = time.perf_counter() - t0
    refs = []
    for _ in range(3):
        t0 = time.perf_counter()
        ref = refine_dw_dist(dsp, mesh1, resd.eigenvectors, tol=1e-8,
                             return_device=True)
        refs.append(time.perf_counter() - t0)
    out["refine_dev_cold_s"] = refc
    out["refine_dev_steady_s"] = sorted(refs)
    out["refine_sweeps"] = int(ref.iterations)
    out["refine_res"] = float(ref.residuals.max())
    print(
        f"dist refine(dev): cold {refc:.2f}s steady {sorted(refs)} "
        f"iters {ref.iterations} res {ref.residuals.max():.1e}",
        file=sys.stderr, flush=True,
    )

    med = float(np.median(out["refine_dev_steady_s"]))
    meds = float(np.median(out["solve_steady_s"]))
    out["dist_time_to_1e8_device_resident_s"] = meds + med
    print(json.dumps(out))
    with open(f"exp_r5dist_{grid}_results.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
