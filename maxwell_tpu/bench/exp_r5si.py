"""Round-5 chip probe: shift-invert on the chip scoreboard (round-4
VERDICT item 9 — no SI path had a hardware perf row).

Rows:
  - 2D assembled 128x128 (the reference's config-3 workload class at
    16x its grid): native LDL^T factor wall (host), level-scheduled
    device tri-solve SI apply time, full interior-mode solve wall.
  - 64^3 stencil: matrix-free MINRES SI apply time + interior-mode
    solve wall (no factorization — SURVEY.md §7.5 option (c)).

3D ASSEMBLED factors are deliberately absent: an RCM-ordered 3D
curl-curl factor has bandwidth ~n^(2/3); the level-scheduled solve's
dense (levels, Rmax, Smax) padding then explodes (measured: >20 GB in
the padding alone at 24^3) — the TPU-idiomatic 3D interior-mode path is
the matrix-free MINRES backend, which is what the bench records.

Usage: timeout 2400 python -m maxwell_tpu.bench.exp_r5si
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from maxwell_tpu.problems import RectCavity2D
    from maxwell_tpu.solvers.operator import Pencil
    from maxwell_tpu.solvers.shift_invert import (
        build_shift_invert_op,
        shift_invert_lanczos,
    )

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    out = {}

    def log(m):
        print(m, file=sys.stderr, flush=True)

    def chain_time(ap, x, k):
        f = jax.jit(
            lambda z: jax.lax.fori_loop(0, k, lambda i, w: ap(w), z)
        )
        y = f(x)
        np.asarray(y.ravel()[:1])
        t0 = time.perf_counter()
        y = f(y)
        np.asarray(y.ravel()[:1])
        return time.perf_counter() - t0

    # ---- 2D assembled 128x128: LDL^T factor + device tri-solve ---------
    g = 128
    cav = RectCavity2D(nx=g, ny=g)
    pencil = Pencil.from_problem(cav, kernel="ref", dtype=jnp.float32)
    sigma = 45.0
    t0 = time.perf_counter()
    apply_op = build_shift_invert_op(
        pencil, sigma, backend="ldlt", KM=(cav.K, cav.M)
    )
    out["ldlt_factor_2d128_s"] = time.perf_counter() - t0
    out["ldlt_factor_2d128_n"] = int(cav.K.shape[0])
    log(f"ldlt factor 2d 128x128 (n={cav.K.shape[0]}): "
        f"{out['ldlt_factor_2d128_s']:.2f}s")

    x = jax.random.normal(jax.random.PRNGKey(0), (pencil.n_padded, 1),
                          jnp.float32)
    ap = jax.jit(lambda z: apply_op(z))
    t1, t2 = chain_time(ap, x, 8), chain_time(ap, x, 16)
    out["si_apply_2d128_s"] = max((t2 - t1) / 8, 1e-9)
    log(f"SI apply 2d128 (device tri-solve): "
        f"{out['si_apply_2d128_s']*1e3:.2f} ms")

    t0 = time.perf_counter()
    r = shift_invert_lanczos(pencil, sigma=sigma, nev=4, maxiter=40,
                             tol=1e-6, backend="ldlt", KM=(cav.K, cav.M))
    out["si_solve_2d128_s"] = time.perf_counter() - t0
    out["si_solve_2d128_res"] = float(r.residuals.max())
    out["si_solve_2d128_eigs"] = [float(v) for v in r.eigenvalues]
    log(f"SI solve 2d128: {out['si_solve_2d128_s']:.1f}s res "
        f"{r.residuals.max():.1e} eigs {np.sort(r.eigenvalues)[:4]}")

    # ---- 64^3 stencil: matrix-free MINRES SI ---------------------------
    from maxwell_tpu.problems.stencil3d import StencilPencil3D

    stp = StencilPencil3D.build(nx=64, ny=64, nz=64, dtype=jnp.float32)
    si = build_shift_invert_op(stp, 60.0, backend="iterative")
    xs = jax.random.normal(jax.random.PRNGKey(1), (stp.n_padded,),
                           jnp.float32) * stp.mask
    aps = jax.jit(lambda z: si(z))
    t1, t2 = chain_time(aps, xs, 2), chain_time(aps, xs, 4)
    out["si_apply_64_stencil_s"] = max((t2 - t1) / 2, 1e-9)
    log(f"SI apply 64^3 stencil (MINRES-400): "
        f"{out['si_apply_64_stencil_s']*1e3:.1f} ms")

    t0 = time.perf_counter()
    rs = shift_invert_lanczos(stp, sigma=60.0, nev=3, maxiter=30,
                              tol=1e-5, backend="iterative")
    out["si_solve_64_stencil_s"] = time.perf_counter() - t0
    out["si_solve_64_res"] = float(rs.residuals.max())
    out["si_solve_64_eigs"] = [float(v) for v in rs.eigenvalues]
    log(f"SI solve 64^3 stencil: {out['si_solve_64_stencil_s']:.1f}s res "
        f"{rs.residuals.max():.1e} eigs {np.sort(rs.eigenvalues)[:3]}")

    print(json.dumps(out))
    with open("exp_r5si_results.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
