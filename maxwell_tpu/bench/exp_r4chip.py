"""Round-4 chip validation: (1) double-word error-free transforms survive
the XLA:TPU compiler (the CPU backend miscompiles minor-axis-broadcast
Dekker patterns — utils/twofloat caution note — so the chip needs its own
proof); (2) the pack=2/cl=1024 production union kernel parity + timing on
the real chip; (3) dw tap-apply and spectral-solve cost at 64^3 (the
refine_dw budget).

Usage: python -m maxwell_tpu.bench.exp_r4chip
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from maxwell_tpu.bench.exp_gather import timeit_chain
    from maxwell_tpu.utils import twofloat as tf

    dev = jax.devices()[0]
    print(f"device={dev}", file=sys.stderr, flush=True)
    results = {"device": str(dev)}
    rng = np.random.default_rng(7)

    # --- 1. dw exactness on this backend --------------------------------
    n, m = 4096, 8
    a64 = rng.standard_normal((n, m))
    b64 = rng.standard_normal((n, m))
    checks = {}
    A = jnp.asarray(a64, jnp.float32)
    B = jnp.asarray(b64, jnp.float32)
    for label, x, y in (
        ("same_shape", A, B),
        ("scalar", jnp.float32(1.7320508), B),
        ("row_major_bcast", A[:1], B),     # (1,m)*(n,m)
        ("col_minor_bcast", A[:, :1], B),  # (n,1)*(n,m) — CPU breaks this
        ("outer", A[:, :1], B[:1]),        # (n,1)*(1,m) — CPU breaks this
    ):
        p, e = jax.jit(tf.two_prod)(x, y)
        ref = np.asarray(x, np.float64) * np.asarray(y, np.float64)
        err = float(
            np.abs(
                np.asarray(p, np.float64) + np.asarray(e, np.float64) - ref
            ).max()
        )
        checks[label] = err
        print(f"two_prod {label:16s} err={err:.2e}", file=sys.stderr,
              flush=True)
    results["two_prod_err"] = checks

    # dw_sum accuracy at size 1e6 (reduction correctness on chip)
    x64 = rng.standard_normal(1_000_000)
    xh, xl = tf.dw_from_f64(x64)
    sh, sl = jax.jit(tf.dw_sum)(jnp.asarray(xh), jnp.asarray(xl))
    ref = tf.dw_to_f64(xh, xl).sum()
    results["dw_sum_err"] = abs(tf.dw_to_f64(
        np.asarray(sh), np.asarray(sl)) - ref)
    print(f"dw_sum err={results['dw_sum_err']:.2e}", file=sys.stderr,
          flush=True)

    # --- 2. production union kernel on chip -----------------------------
    from maxwell_tpu.kernels.spmm import bellunion_matmat_pallas
    from maxwell_tpu.problems import BrickCavity3D
    from maxwell_tpu.sparse.bellunion import BELLUnion
    from maxwell_tpu.sparse.reorder import PermutedProblem

    big = jnp.ones((64 * 1024 * 1024,), jnp.float32)
    bw = 2 * big.size * 4 / timeit_chain(lambda x: jnp.abs(x) + 1.0, big)
    results["bw_GBps"] = bw / 1e9

    cav = PermutedProblem(BrickCavity3D(nx=24, ny=24, nz=24))
    Kcsr = cav.K.tocsr()
    AU = BELLUnion.from_csr(Kcsr, block=8, dtype=jnp.float32)
    X = jnp.asarray(
        rng.standard_normal((AU.n_cols_padded, m)), jnp.float32
    )
    Y = bellunion_matmat_pallas(AU, X)
    Yref = Kcsr @ np.asarray(X[: Kcsr.shape[1]], np.float64)
    err = float(
        np.abs(np.asarray(Y)[: Kcsr.shape[0]] - Yref).max()
        / np.abs(Yref).max()
    )
    t = timeit_chain(jax.jit(lambda X: bellunion_matmat_pallas(AU, X)), X)
    own = AU.nnz_dense * 4 + AU.ucols.size * 4 + 2 * AU.n_padded * m * 4
    results["union_prod"] = {
        "time_s": t, "err": err, "pct": 100 * own / bw / t,
        "nnz_per_s": int(Kcsr.nnz / t),
    }
    print(f"union prod: {t*1e6:.0f}us {100*own/bw/t:.1f}% err={err:.1e}",
          file=sys.stderr, flush=True)
    del AU, X, Y

    # --- 3. dw apply + spectral solve cost at 64^3 ----------------------
    from maxwell_tpu.problems.stencil3d import StencilPencil3D
    from maxwell_tpu.solvers.spectral import SpectralShiftSolver

    stp = StencilPencil3D.build(nx=64, ny=64, nz=64, dtype=jnp.float32)
    mm = 5
    Xh = jnp.asarray(
        rng.standard_normal((stp.n_padded, mm)), jnp.float32
    )
    Xpair = jnp.stack([Xh, jnp.zeros_like(Xh)])

    def dw_apply(pair):
        (KXh, KXl), (MXh, MXl) = stp.KM_mm_dw(pair[0], pair[1])
        return jnp.stack([KXh + MXh, KXl + MXl])  # shape-preserving chain

    t0 = time.perf_counter()
    o = jax.jit(dw_apply)(Xpair)
    np.asarray(o.ravel()[:1])
    results["dw_apply_64_compile_s"] = time.perf_counter() - t0
    t_dw = timeit_chain(jax.jit(dw_apply), Xpair)
    results["dw_apply_64_s"] = t_dw
    t_f32 = timeit_chain(jax.jit(stp.K_mm), Xh)
    results["f32_apply_64_s"] = t_f32
    print(
        f"64^3 m=5: dw KM apply {t_dw*1e3:.2f}ms (compile "
        f"{results['dw_apply_64_compile_s']:.0f}s), f32 K apply "
        f"{t_f32*1e3:.2f}ms", file=sys.stderr, flush=True,
    )

    sol = SpectralShiftSolver.build(
        1.0, 1.0, 1.0, 64, 64, 64, alpha=0.0, n_padded=stp.n_padded,
        dtype=jnp.float32,
    )
    sig = jnp.asarray(rng.uniform(20.0, 30.0, mm), jnp.float32)
    t_sp = timeit_chain(
        jax.jit(lambda R: sol.solve_sigma(R, sig)), Xh
    )
    results["spectral_sigma_64_s"] = t_sp
    print(f"spectral solve_sigma 64^3: {t_sp*1e3:.2f}ms",
          file=sys.stderr, flush=True)

    with open("exp_r4chip_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
