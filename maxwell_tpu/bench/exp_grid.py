"""Decompose the BELLPairs kernel's per-tile cost: grid-step overhead,
concat-vs-accumulate gather, and output write-back across chunk steps.

  e0_grid1      empty kernel, grid (T,)
  e1_grid6      empty kernel, grid (T, 6), out index constant in j
  e2_grid6_when empty kernel, grid (T, 6), all chunks dead via pl.when
  e3_acc424     424 pair slices per tile, ACCUMULATED (no concat), grid (T,)
  e4_cat424     424 pair slices per tile, CONCATENATED into panels, grid (T,)
  e5_cat424_mm  e4 + the batched chunk einsums (full v7 compute, grid (T,))

Usage: python -m maxwell_tpu.bench.exp_grid
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from maxwell_tpu.bench.exp_gather import timeit_chain


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dev = jax.devices()[0]
    T, R, b, m, Cp, NCH = 298, 16, 8, 8, 8, 6
    LIVE = 3  # live chunks per tile (mean of the 24^3 matrix is ~3.3)
    nbr = T * R
    n = nbr * b
    rng = np.random.default_rng(0)
    cols = jnp.asarray(
        rng.integers(0, nbr - 1, size=(nbr, NCH * Cp), dtype=np.int32)
    )
    nch = jnp.full((T,), LIVE, jnp.int32)
    X = jnp.asarray(rng.standard_normal((n + b, m)), jnp.float32)
    vals = jnp.asarray(
        rng.standard_normal((nbr * b, NCH * Cp * 2 * b)), jnp.float32
    )

    results = {"device": str(dev), "T": T}
    print(f"device={dev}", file=sys.stderr, flush=True)

    def report(name, fn, x0):
        try:
            t0 = time.perf_counter()
            y = fn(x0)
            np.asarray(np.asarray(y).ravel()[:1])
            tc = time.perf_counter() - t0
            t = timeit_chain(fn, x0)
            results[name] = {"time_s": t, "per_tile_ns": t / T * 1e9,
                             "compile_s": tc}
            print(f"{name:16s} {t*1e6:8.1f}us  {t/T*1e9:7.0f} ns/tile "
                  f"(compile {tc:.0f}s)", file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": repr(e)[:300]}
            print(f"{name:16s} FAILED {repr(e)[:160]}", file=sys.stderr,
                  flush=True)

    out_sds = jax.ShapeDtypeStruct((T * R * b, m), jnp.float32)
    ospec1 = pl.BlockSpec((R * b, m), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    def e0_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[0:R * b, :]

    @jax.jit
    def e0(X):
        return pl.pallas_call(
            e0_kernel, grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=ospec1, out_shape=out_sds,
        )(X)

    ospec2 = pl.BlockSpec((R * b, m), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)

    def e1_kernel(x_ref, o_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = x_ref[0:R * b, :]

    @jax.jit
    def e1(X):
        return pl.pallas_call(
            e1_kernel, grid=(T, NCH),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=ospec2, out_shape=out_sds,
        )(X)

    ospec2p = pl.BlockSpec((R * b, m), lambda i, j, nch: (i, 0),
                           memory_space=pltpu.VMEM)

    def e2_kernel(nch_ref, x_ref, o_ref):
        i, j = pl.program_id(0), pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = x_ref[0:R * b, :]

        @pl.when(j < nch_ref[i])
        def _():
            o_ref[:] += x_ref[0:R * b, :]

    @jax.jit
    def e2(X):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(T, NCH),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=ospec2p,
        )
        return pl.pallas_call(e2_kernel, grid_spec=gs, out_shape=out_sds)(
            nch, X
        )

    # --- gather styles at matched slice count (LIVE*Cp*R pair slices) -----
    def e3_kernel(cols_ref, x_ref, o_ref):
        acc = jnp.zeros((2 * b, m), jnp.float32)
        for r in range(R):
            for q in range(LIVE * Cp):
                acc = acc + x_ref[pl.ds(cols_ref[r, q] * b, 2 * b), :]
        o_ref[:] = jnp.tile(acc, (R // 2, 1))

    @jax.jit
    def e3(X):
        return pl.pallas_call(
            e3_kernel, grid=(T,),
            in_specs=[
                pl.BlockSpec((R, NCH * Cp), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=ospec1, out_shape=out_sds,
        )(cols, X)

    def _cat_panels(cols_ref, x_ref, q0, q1):
        panels = []
        for r in range(R):
            parts = [
                x_ref[pl.ds(cols_ref[r, q] * b, 2 * b), :]
                for q in range(q0, q1)
            ]
            panels.append(jnp.concatenate(parts, axis=0))
        return jnp.stack(panels)  # (R, (q1-q0)*2b, m)

    def e4_kernel(cols_ref, x_ref, o_ref):
        acc = jnp.zeros((R, 2 * b, m), jnp.float32)
        for c in range(LIVE):
            xg = _cat_panels(cols_ref, x_ref, c * Cp, (c + 1) * Cp)
            acc = acc + xg.reshape(R, Cp, 2 * b, m).sum(axis=1)
        o_ref[:] = acc.reshape(R * 2 * b, m)[0:R * b, :]

    @jax.jit
    def e4(X):
        return pl.pallas_call(
            e4_kernel, grid=(T,),
            in_specs=[
                pl.BlockSpec((R, NCH * Cp), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=ospec1, out_shape=out_sds,
        )(cols, X)

    def e5_kernel(cols_ref, vals_ref, x_ref, o_ref):
        acc = jnp.zeros((R, b, m), jnp.float32)
        for c in range(LIVE):
            xg = _cat_panels(cols_ref, x_ref, c * Cp, (c + 1) * Cp)
            acc = acc + jnp.einsum(
                "rik,rkm->rim",
                vals_ref[:, c * Cp * 2 * b:(c + 1) * Cp * 2 * b].reshape(
                    R, b, Cp * 2 * b
                ),
                xg,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        o_ref[:] = acc.reshape(R * b, m)

    @jax.jit
    def e5(X):
        return pl.pallas_call(
            e5_kernel, grid=(T,),
            in_specs=[
                pl.BlockSpec((R, NCH * Cp), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((R * b, NCH * Cp * 2 * b), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=ospec1, out_shape=out_sds,
        )(cols, vals, X)

    def chainable(run):
        # timeit_chain feeds output back as input: re-pad to X's shape
        return lambda x: jnp.pad(run(x), ((0, b), (0, 0)))

    report("e0_grid1", chainable(e0), X)
    report("e1_grid6", chainable(e1), X)
    report("e2_grid6_when", chainable(e2), X)
    report("e3_acc424", chainable(e3), X)
    report("e4_cat424", chainable(e4), X)
    report("e5_cat424_mm", chainable(e5), X)

    with open("exp_grid_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
