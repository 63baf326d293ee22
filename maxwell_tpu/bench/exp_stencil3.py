"""On-chip measurement of the Pallas tap-stencil kernel vs the XLA-fused
tap apply (round-2 VERDICT item 3).

Usage: python -m maxwell_tpu.bench.exp_stencil3 [grid [m [cases...]]]
cases: xla, pallas, pallas_roll (default all). Writes/merges
exp_stencil3_results.json.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from maxwell_tpu.bench.exp_gather import timeit_chain
from maxwell_tpu.problems.stencil3d import StencilPencil3D


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cases = sys.argv[3:] or ["xla", "pallas", "pallas_roll"]
    print("device", jax.devices()[0], "grid", grid, "m", m,
          file=sys.stderr, flush=True)
    bw = 491.8e9
    path = "exp_stencil3_results.json"
    res = {}
    if os.path.exists(path):
        with open(path) as f:
            res = json.load(f)

    ref_out = None
    for impl in cases:
        stp = StencilPencil3D.build(
            nx=grid, ny=grid, nz=grid, dtype=jnp.float32, taps_impl=impl
        )
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.standard_normal((stp.n_padded, m)), jnp.float32)
        roof_K = 2 * stp.n_padded * m * 4 / bw
        roof_KM = 3 * stp.n_padded * m * 4 / bw
        # correctness cross-check between impls (first impl = reference)
        Y = np.asarray(stp.K_mm(X))
        if ref_out is None:
            ref_out = Y
        else:
            err = np.abs(Y - ref_out).max() / np.abs(ref_out).max()
            assert err < 1e-5, (impl, err)
            print(f"{impl}: parity vs first impl {err:.2e}",
                  file=sys.stderr, flush=True)
        for name, fn, roof in (
            (f"{impl}_K_g{grid}_m{m}", lambda Z: stp.K_mm(Z), roof_K),
            (
                f"{impl}_KM_g{grid}_m{m}",
                lambda Z: (lambda a, b: a + b)(*stp.KM_mm(Z)),
                roof_KM,
            ),
        ):
            t0 = time.time()
            t = timeit_chain(fn, X, iters=8)
            res[name] = {
                "time_s": t,
                "pct_own_roofline": 100 * roof / t,
                "compile_s": time.time() - t0,
            }
            print(f"{name}: {t*1e6:.0f}us {100*roof/t:.1f}% ownSoL",
                  file=sys.stderr, flush=True)
            with open(path, "w") as f:
                json.dump(res, f, indent=2)
        del stp, X
    print(json.dumps(res))


if __name__ == "__main__":
    main()
