"""Weak/strong scaling harness (SURVEY.md §6: "scaling efficiency reported
at 1 chip, 1 host, N>=2 hosts"; BASELINE.json config 5 gate: >=70% weak
scaling).

Runs the sharded SpMM over meshes of growing size. On real TPU hardware the
efficiency numbers are the deliverable; on the CPU-simulated mesh (all
"devices" share host cores) they are structural smoke numbers and are
labeled simulated=true.

Usage: python -m maxwell_tpu.bench.scaling [--mode weak|strong]
"""

from __future__ import annotations

import argparse
import json
import time


def _timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def run(mode: str = "weak", base_ny: int = 48):
    import jax
    import jax.numpy as jnp

    from maxwell_tpu.dist import make_mesh, partition_problem
    from maxwell_tpu.problems import RectCavity2D
    from maxwell_tpu.solvers.dist_solve import spmm_dist

    n_dev = len(jax.devices())
    simulated = jax.devices()[0].platform == "cpu"
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    rows = []
    t1 = None
    for D in sizes:
        # weak: rows grow with D (constant work per device);
        # strong: fixed global problem
        ny = base_ny * D if mode == "weak" else base_ny * max(sizes)
        cav = RectCavity2D(nx=base_ny, ny=ny)
        dp = partition_problem(cav, D, block=8, dtype=jnp.float32)
        mesh = make_mesh(D)
        key = jax.random.PRNGKey(0)
        n_pad_g = dp.D * dp.L * dp.b
        X = jax.random.normal(key, (n_pad_g, 8), jnp.float32)
        X = X.at[dp.n :].set(0.0)
        t = _timeit(
            lambda: spmm_dist(dp, mesh, X, which="K").block_until_ready()
        )
        nnz = int(cav.K.nnz)
        rate = nnz / t
        if D == 1:
            t1, nnz1 = t, nnz
        if mode == "weak":
            eff = (t1 / t) if t1 else 1.0  # equal per-device work
        else:
            eff = (t1 / (t * D)) if t1 else 1.0
        rows.append(
            {
                "devices": D,
                "n": cav.n_edges,
                "nnz": nnz,
                "t_spmm_s": t,
                "nnz_per_s": rate,
                "efficiency": eff,
                "halo_depth_brows": dp.H,
            }
        )
    report = {
        "mode": mode,
        "simulated": simulated,
        "platform": jax.devices()[0].platform,
        "rows": rows,
    }
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="weak", choices=["weak", "strong"])
    ap.add_argument("--base-ny", type=int, default=48)
    a = ap.parse_args()
    run(a.mode, a.base_ny)
