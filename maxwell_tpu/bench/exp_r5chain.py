"""Round-5 chip probe: device-resident solve->refine chain vs the
host-round-trip path (round-4 VERDICT item 1).

Measures, at 64^3 (811k DOFs) on the real chip:
  - lobpcg(return_device=True): solve wall (steady, median of 3)
  - refine_dw(device X, return_device=True): refine wall (steady,
    median of 3) + executed sweep count (early-exit while_loop)
  - the OLD path for contrast: host-fetched eigenvectors in, f64 host
    vectors out.

Usage: timeout 1800 python -m maxwell_tpu.bench.exp_r5chain [grid]
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

    from maxwell_tpu.problems.stencil3d import StencilPencil3D
    from maxwell_tpu.solvers import lobpcg
    from maxwell_tpu.solvers.refine_device import refine_dw
    from maxwell_tpu.solvers.spectral import spectral_preconditioner

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    out = {"grid": grid}

    stp = StencilPencil3D.build(nx=grid, ny=grid, nz=grid,
                                dtype=jnp.float32)
    pc = spectral_preconditioner(stp, alpha=15.0)
    kw = dict(nev=5, maxiter=60, tol=2e-6, precond=pc, stall_window=10,
              return_device=True)

    # cold (compile) + 3 steady runs
    t0 = time.perf_counter()
    res = lobpcg(stp, **kw)
    cold = time.perf_counter() - t0
    solves = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = lobpcg(stp, **kw)
        solves.append(time.perf_counter() - t0)
    out["solve_cold_s"] = cold
    out["solve_steady_s"] = sorted(solves)
    out["solve_iters"] = int(res.iterations)
    out["solve_res"] = float(res.residuals.max())
    print(f"solve: cold {cold:.2f}s steady {sorted(solves)}",
          file=sys.stderr, flush=True)

    # device-resident refine: cold + 3 steady
    t0 = time.perf_counter()
    ref = refine_dw(stp, res.eigenvectors, tol=1e-8, return_device=True)
    refc = time.perf_counter() - t0
    refs = []
    for _ in range(3):
        t0 = time.perf_counter()
        ref = refine_dw(stp, res.eigenvectors, tol=1e-8,
                        return_device=True)
        refs.append(time.perf_counter() - t0)
    out["refine_dev_cold_s"] = refc
    out["refine_dev_steady_s"] = sorted(refs)
    out["refine_sweeps"] = int(ref.iterations)
    out["refine_res"] = float(ref.residuals.max())
    print(
        f"refine(dev): cold {refc:.2f}s steady {sorted(refs)} "
        f"iters {ref.iterations} res {ref.residuals.max():.1e}",
        file=sys.stderr, flush=True,
    )

    # OLD host-round-trip path for contrast (one steady run)
    Xhost = np.asarray(res.eigenvectors[: stp.n])
    t0 = time.perf_counter()
    refh = refine_dw(stp, Xhost, tol=1e-8)
    out["refine_host_steady_s"] = time.perf_counter() - t0
    out["refine_host_res"] = float(refh.residuals.max())
    print(
        f"refine(host path): {out['refine_host_steady_s']:.2f}s "
        f"res {refh.residuals.max():.1e}",
        file=sys.stderr, flush=True,
    )

    med = float(np.median(out["refine_dev_steady_s"]))
    meds = float(np.median(out["solve_steady_s"]))
    out["time_to_1e8_device_resident_s"] = meds + med
    print(json.dumps(out))
    with open(f"exp_r5chain_{grid}_results.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
