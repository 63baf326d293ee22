"""Micro-benchmark of X-gather mechanisms inside Pallas TPU kernels.

The blocked-ELL SpMM is gather-bound (exp_spmm.py: value streaming runs at
91% of roofline, but collecting the X panels via per-block sublane dynamic
slices costs ~3 ns per (8, m) slice — ~6x the roofline at m=8). This probes
every plausible gather mechanism at matched work so the production kernel
can be designed around the fastest one:

  g0_slices     per-slot (8, m) sublane dynamic slices (current kernel)
  g1_slices2x   (16, m) slices (pair slots) — tests vreg-count scaling
  g2_taa0       jnp.take_along_axis(x_tile, idx, axis=0) on a (P, m) tile
  g3_taa1       jnp.take_along_axis(xt_tile, idx, axis=1) on an (m, P) tile
  g4_lane_ds    dynamic LANE slices from an (m, n) X^T resident in VMEM
  g5_onedot     no gather at all (fixed panel) — the streaming ceiling

Usage: python -m maxwell_tpu.bench.exp_gather [n_tiles] [S]
Writes exp_gather_results.json.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def timeit_chain(fn, x0, iters=8, repeats=2):
    import jax

    def run(k):
        f = jax.jit(lambda x: jax.lax.fori_loop(0, k, lambda i, y: fn(y), x))
        y = f(x0)
        np.asarray(y.ravel()[:1])
        best = np.inf
        for _ in range(repeats):
            y = f(x0)
            t0 = time.perf_counter()
            for _ in range(3):
                y = f(y)
            np.asarray(y.ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        return best / 3.0

    t1 = run(iters)
    t2 = run(2 * iters)
    return max((t2 - t1) / iters, 1e-12)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dev = jax.devices()[0]
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 298
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    b, m, R = 8, 8, 16
    nbr = n_tiles * R
    n = nbr * b
    rng = np.random.default_rng(0)
    cols_np = rng.integers(0, nbr, size=(nbr, S), dtype=np.int32)
    cols = jnp.asarray(cols_np)
    X = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    XT = jnp.asarray(np.ascontiguousarray(np.asarray(X).T))  # (m, n)
    P = S * b  # gathered panel rows per block-row

    results = {"device": str(dev), "n_tiles": n_tiles, "S": S}
    print(f"device={dev} n={n} tiles={n_tiles} S={S}", file=sys.stderr,
          flush=True)

    def report(name, fn, x0):
        try:
            t0 = time.perf_counter()
            y = fn(x0)
            np.asarray(np.asarray(y).ravel()[:1])
            tc = time.perf_counter() - t0
            t = timeit_chain(fn, x0)
            per_tile_ns = t / n_tiles * 1e9
            results[name] = {
                "time_s": t, "per_tile_ns": per_tile_ns, "compile_s": tc,
            }
            print(f"{name:14s} {t*1e6:9.1f}us  {per_tile_ns:8.0f} ns/tile "
                  f"(compile {tc:.0f}s)", file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": repr(e)[:300]}
            print(f"{name:14s} FAILED {repr(e)[:160]}", file=sys.stderr,
                  flush=True)

    # --- g0: per-slot (8, m) sublane dynamic slices (current kernel) -------
    def g0_kernel(cols_ref, x_ref, o_ref):
        acc = jnp.zeros((b, m), jnp.float32)
        for r in range(R):
            for s in range(S):
                acc = acc + x_ref[pl.ds(cols_ref[r, s] * b, b), :]
        o_ref[:] = jnp.tile(acc, (R, 1))

    @jax.jit
    def g0(X):
        return pl.pallas_call(
            g0_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R * b, m), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        )(cols, X)

    # --- g1: (16, m) slices, half the count — vreg-count scaling probe -----
    def g1_kernel(cols_ref, x_ref, o_ref):
        acc = jnp.zeros((2 * b, m), jnp.float32)
        for r in range(R):
            for s in range(S // 2):
                acc = acc + x_ref[pl.ds(cols_ref[r, s] * b, 2 * b), :]
        o_ref[:] = jnp.tile(acc, (R // 2, 1))

    @jax.jit
    def g1(X):
        return pl.pallas_call(
            g1_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R * b, m), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        )(cols, jnp.pad(X, ((0, b), (0, 0))))

    # --- g2: take_along_axis axis=0 within a (P, m) VMEM tile --------------
    # gathers P rows out of a resident (P, m) scratch per tile: probes the
    # tpu.dynamic_gather sublane path at matched output volume
    idx0 = jnp.asarray(
        rng.integers(0, P, size=(n_tiles * P, m), dtype=np.int32)
    )

    def g2_kernel(idx_ref, x_ref, o_ref):
        src = x_ref[0:P, :]
        g = jnp.take_along_axis(src, idx_ref[:], axis=0)
        o_ref[:] = g[0:b, :] + g[P - b:P, :]

    @jax.jit
    def g2(X):
        return pl.pallas_call(
            g2_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((P, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, m), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * b, m), jnp.float32),
        )(idx0, X)

    # --- g3: take_along_axis axis=1 within an (m, P) tile (lane gather) ----
    idx1 = jnp.asarray(
        rng.integers(0, P, size=(n_tiles * m, P), dtype=np.int32)
    )

    def g3_kernel(idx_ref, xt_ref, o_ref):
        src = xt_ref[:, 0:P]
        g = jnp.take_along_axis(src, idx_ref[:], axis=1)
        o_ref[:] = g

    @jax.jit
    def g3(XT):
        return pl.pallas_call(
            g3_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((m, P), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, P), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * m, P), jnp.float32),
        )(idx1, XT)

    # --- g3w: same lane gather but from a WIDE (m, 4096) source tile -------
    W = 4096
    idx1w = jnp.asarray(
        rng.integers(0, W, size=(n_tiles * m, W), dtype=np.int32)
    )
    XTW = jnp.asarray(
        rng.standard_normal((n_tiles * m, W)), jnp.float32
    )

    def g3w_kernel(idx_ref, xt_ref, o_ref):
        g = jnp.take_along_axis(xt_ref[:], idx_ref[:], axis=1)
        o_ref[:] = g[:, 0:P]

    @jax.jit
    def g3w(XTW):
        return pl.pallas_call(
            g3w_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((m, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, P), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * m, P), jnp.float32),
        )(idx1w, XTW)

    # --- g4: dynamic LANE slices from resident (m, n) X^T ------------------
    def g4_kernel(cols_ref, xt_ref, o_ref):
        acc = jnp.zeros((m, 2 * b), jnp.float32)
        for r in range(R):
            for s in range(S // 2):
                acc = acc + xt_ref[:, pl.ds(cols_ref[r, s] * b, 2 * b)]
        o_ref[:] = jnp.tile(acc, (1, S))

    @jax.jit
    def g4(XT):
        return pl.pallas_call(
            g4_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, 2 * b * S), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * m, 2 * b * S),
                                           jnp.float32),
        )(cols, jnp.pad(XT, ((0, 0), (0, b))))

    # --- g5: no gather (fixed panel) — floor -------------------------------
    def g5_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[0:R * b, :]

    @jax.jit
    def g5(X):
        return pl.pallas_call(
            g5_kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R * b, m), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        )(X)

    report("g5_floor", g5, X)
    report("g0_slices", g0, X)
    report("g1_slices2x", g1, X)
    report("g2_taa0", g2, X)
    report("g3_taa1", g3, XT)
    report("g3w_taa1_wide", g3w, XTW)
    report("g4_lane_ds", g4, XT)

    with open("exp_gather_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
