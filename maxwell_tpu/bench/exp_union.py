"""Synthetic end-to-end probe of the tile-union SpMM design: per 128-row
tile, gather the UNION of its block-columns once (123 block-cols mean on
the 24^3 operator) into one (K, m) panel and run ONE well-shaped
(128, K)@(K, m) dot against values pre-scattered into the dense union
panel. Decides the production layout before building it.

  u0_hi    full design, HIGHEST (f32-true) dot
  u0_def   same, DEFAULT (bf16) dot — MXU pass-count reference
  u1_runs  gather as 16 run-slices of 8 block-cols (vs 128 singles)
  u2_km    fused: one gather, TWO dots + value streams (K and M)

Usage: python -m maxwell_tpu.bench.exp_union [n_tiles] [UC]
(UC = union cols per tile, default 128 -> K = 1024 rows)
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
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 298
    UC = int(sys.argv[2]) if len(sys.argv) > 2 else 128  # union cols/tile
    b, m = 8, 8
    K = UC * b
    nbr = T * 16
    n = nbr * b
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, nbr, size=(T, UC), dtype=np.int32))
    # run starts for u1: gather 8 consecutive block-cols per slice
    rcols = jnp.asarray(
        rng.integers(0, nbr - 8, size=(T, UC // 8), dtype=np.int32)
    )
    X = jnp.asarray(rng.standard_normal((n + 8 * b, m)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((T * 128, K)), jnp.float32)
    vals_b = jnp.asarray(rng.standard_normal((T * 128, K)), jnp.float32)

    results = {"device": str(dev), "T": T, "UC": UC}
    bw = 467e9
    roof1 = (vals.size * 4 + 2 * n * m * 4) / bw
    roof2 = (2 * vals.size * 4 + 3 * n * m * 4) / bw
    results["roof1_s"], results["roof2_s"] = roof1, roof2
    print(f"device={dev} T={T} UC={UC} roof1={roof1*1e6:.0f}us "
          f"roof2={roof2*1e6:.0f}us", file=sys.stderr, flush=True)

    def report(name, fn, x0, roof):
        try:
            t0 = time.perf_counter()
            y = fn(x0)
            np.asarray(np.asarray(y).ravel()[:1])
            tc = time.perf_counter() - t0
            t = timeit_chain(fn, x0)
            results[name] = {"time_s": t, "per_tile_ns": t / T * 1e9,
                             "pct_roof": 100 * roof / t, "compile_s": tc}
            print(f"{name:10s} {t*1e6:8.1f}us {t/T*1e9:7.0f} ns/tile "
                  f"{100*roof/t:6.1f}% SoL (compile {tc:.0f}s)",
                  file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": repr(e)[:300]}
            print(f"{name:10s} FAILED {repr(e)[:200]}", file=sys.stderr,
                  flush=True)

    out_sds = jax.ShapeDtypeStruct((n + 8 * b, m), jnp.float32)
    ospec = pl.BlockSpec((128, m), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def mk_u0(prec):
        def kernel(cols_ref, vals_ref, x_ref, o_ref):
            r8 = pl.program_id(0) % 8
            parts = [
                x_ref[pl.ds(cols_ref[r8, q] * b, b), :] for q in range(UC)
            ]
            xg = jnp.concatenate(parts, axis=0)  # (K, m)
            o_ref[:] = jnp.dot(
                vals_ref[:], xg, preferred_element_type=jnp.float32,
                precision=prec,
            )

        @jax.jit
        def run(X):
            y = pl.pallas_call(
                kernel, grid=(T,),
                in_specs=[
                    pl.BlockSpec((8, UC), lambda i: (i // 8, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((128, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=ospec,
                out_shape=jax.ShapeDtypeStruct((T * 128, m), jnp.float32),
            )(cols, vals, X)
            return jnp.pad(y, ((0, X.shape[0] - T * 128), (0, 0)))
        return run

    def mk_u1(prec):
        def kernel(cols_ref, vals_ref, x_ref, o_ref):
            r8 = pl.program_id(0) % 8
            parts = [
                x_ref[pl.ds(cols_ref[r8, q] * b, 8 * b), :]
                for q in range(UC // 8)
            ]
            xg = jnp.concatenate(parts, axis=0)
            o_ref[:] = jnp.dot(
                vals_ref[:], xg, preferred_element_type=jnp.float32,
                precision=prec,
            )

        @jax.jit
        def run(X):
            y = pl.pallas_call(
                kernel, grid=(T,),
                in_specs=[
                    pl.BlockSpec((8, UC // 8), lambda i: (i // 8, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((128, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=ospec,
                out_shape=jax.ShapeDtypeStruct((T * 128, m), jnp.float32),
            )(rcols, vals, X)
            return jnp.pad(y, ((0, X.shape[0] - T * 128), (0, 0)))
        return run

    def mk_km(prec):
        def kernel(cols_ref, vk_ref, vm_ref, x_ref, ok_ref, om_ref):
            r8 = pl.program_id(0) % 8
            parts = [
                x_ref[pl.ds(cols_ref[r8, q] * b, 8 * b), :]
                for q in range(UC // 8)
            ]
            xg = jnp.concatenate(parts, axis=0)
            ok_ref[:] = jnp.dot(vk_ref[:], xg,
                                preferred_element_type=jnp.float32,
                                precision=prec)
            om_ref[:] = jnp.dot(vm_ref[:], xg,
                                preferred_element_type=jnp.float32,
                                precision=prec)

        @jax.jit
        def run(X):
            yk, ym = pl.pallas_call(
                kernel, grid=(T,),
                in_specs=[
                    pl.BlockSpec((8, UC // 8), lambda i: (i // 8, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((128, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(ospec, ospec),
                out_shape=(
                    jax.ShapeDtypeStruct((T * 128, m), jnp.float32),
                    jax.ShapeDtypeStruct((T * 128, m), jnp.float32),
                ),
            )(rcols, vals, vals_b, X)
            y = yk + ym
            return jnp.pad(y, ((0, X.shape[0] - T * 128), (0, 0)))
        return run

    HI, DE = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT
    report("u0_hi", mk_u0(HI), X, roof1)
    report("u0_def", mk_u0(DE), X, roof1)
    report("u1_runs", mk_u1(HI), X, roof1)
    report("u2_km", mk_km(HI), X, roof2)

    with open("exp_union_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
