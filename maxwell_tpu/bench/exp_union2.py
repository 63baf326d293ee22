"""Round-4 union-kernel variant study on the REAL 24^3 RCM operator
(VERDICT r3 item 2: close the production kernel from 48.6% to >=65% of its
own roofline; the synthetic u0_hi experiment proved ~70% is there).

Variants (all producing identical Y up to f32 roundoff):
  prod512    shipping kernel: cl=512, scratch-buffer gather, pl.when RMW
  cat512     cl=512, gather via value concatenate (no VMEM scratch)
  cat1024    cl=1024 (1 chunk covers the mean 123-col union -> the RMW
             accumulate path nearly vanishes), concatenate gather
  pair1024   cl=1024 + pack=2 aligned runs (69 slices/tile, fill 1.11x)
  quad1024   cl=1024 + pack=4 aligned runs (40 slices/tile, fill 1.30x)

Reports per variant: runtime, %-of-own-roofline (own bytes = stored dense
values + ucols + X/Y), TRUE nnz/s (CSR nnz), compile seconds, max rel err
vs scipy.

Usage: python -m maxwell_tpu.bench.exp_union2
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from maxwell_tpu.bench.exp_gather import timeit_chain
    from maxwell_tpu.kernels.spmm import bellunion_matmat_pallas
    from maxwell_tpu.problems import BrickCavity3D
    from maxwell_tpu.sparse.bellunion import BELLUnion
    from maxwell_tpu.sparse.reorder import PermutedProblem

    dev = jax.devices()[0]
    m = 8
    cav = PermutedProblem(BrickCavity3D(nx=24, ny=24, nz=24))
    Kcsr = cav.K.tocsr()
    nnz = int(Kcsr.nnz)
    rng = np.random.default_rng(0)

    # measured HBM bw for the roofline denominator
    big = jnp.ones((64 * 1024 * 1024,), jnp.float32)
    t_hbm = timeit_chain(lambda x: jnp.abs(x) + 1.0, big)
    bw = 2 * big.size * 4 / t_hbm
    print(f"device={dev} bw={bw/1e9:.1f} GB/s nnz={nnz}",
          file=sys.stderr, flush=True)

    results = {"device": str(dev), "bw_GBps": bw / 1e9, "nnz": nnz}

    def cat_kernel(tile_of_ref, first_ref, ucols_ref, vals_ref, x_ref,
                   o_ref, *, b, m, CG, pack):
        k = pl.program_id(0)
        k8 = k % jnp.int32(8)
        parts = [
            x_ref[pl.ds(ucols_ref[k8, g * pack] * jnp.int32(b), pack * b), :]
            for g in range(CG // pack)
        ]
        xg = jnp.concatenate(parts, axis=0)
        d = jnp.dot(
            vals_ref[:], xg, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        @pl.when(first_ref[k] == jnp.int32(1))
        def _set():
            o_ref[:] = d

        @pl.when(first_ref[k] == jnp.int32(0))
        def _acc():
            o_ref[:] += d

    def run_cat(A, X):
        b, cl = A.b, A.cl
        CG = cl // b
        kernel = functools.partial(
            cat_kernel, b=b, m=m, CG=CG, pack=A.pack
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(A.n_chunks,),
            in_specs=[
                pl.BlockSpec((8, CG), lambda k, tof, fst: (k // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((128, cl), lambda k, tof, fst: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (128, m), lambda k, tof, fst: (tof[k], 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A.n_padded, m), jnp.float32),
        )(A.tile_of, A.first, A.ucols, A.vals, X)

    X0 = jnp.asarray(rng.standard_normal((0, m)), jnp.float32)  # placeholder

    def report(name, A, fn):
        X = jnp.asarray(
            rng.standard_normal((A.n_cols_padded, m)), jnp.float32
        )
        Yref = Kcsr @ np.asarray(X[: Kcsr.shape[1]], np.float64)
        try:
            t0 = time.perf_counter()
            Y = fn(A, X)
            np.asarray(np.asarray(Y).ravel()[:1])
            tc = time.perf_counter() - t0
            Yh = np.asarray(Y)[: Kcsr.shape[0]]
            err = float(
                np.abs(Yh - Yref).max()
                / max(np.abs(Yref).max(), 1e-30)
            )
            f = jax.jit(lambda X: fn(A, X))
            t = timeit_chain(f, X)
            own = A.nnz_dense * 4 + A.ucols.size * 4 + 2 * A.n_padded * m * 4
            roof = own / bw
            results[name] = {
                "time_s": t, "pct": 100 * roof / t, "err": err,
                "nnz_per_s": nnz / t, "storedMB": A.nnz_dense * 4 / 1e6,
                "compile_s": tc, "n_chunks": int(A.n_chunks),
            }
            print(f"{name:10s} {t*1e6:7.1f}us {100*roof/t:5.1f}% SoL "
                  f"{nnz/t/1e9:5.2f} Gnnz/s err={err:.1e} "
                  f"compile={tc:.0f}s chunks={A.n_chunks}",
                  file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": repr(e)[:300]}
            print(f"{name:10s} FAILED {repr(e)[:200]}", file=sys.stderr,
                  flush=True)

    A512 = BELLUnion.from_csr(Kcsr, block=8, dtype=jnp.float32)
    report("prod512", A512,
           lambda A, X: bellunion_matmat_pallas(A, X))
    report("cat512", A512, run_cat)
    del A512

    A1024 = BELLUnion.from_csr(Kcsr, block=8, dtype=jnp.float32,
                               chunk_lanes=1024)
    report("cat1024", A1024, run_cat)
    del A1024

    A1024p2 = BELLUnion.from_csr(Kcsr, block=8, dtype=jnp.float32,
                                 chunk_lanes=1024, pack=2)
    report("pair1024", A1024p2, run_cat)
    del A1024p2

    A1024p4 = BELLUnion.from_csr(Kcsr, block=8, dtype=jnp.float32,
                                 chunk_lanes=1024, pack=4)
    report("quad1024", A1024p4, run_cat)
    del A1024p4

    A512p2 = BELLUnion.from_csr(Kcsr, block=8, dtype=jnp.float32,
                                chunk_lanes=512, pack=2)
    report("pair512", A512p2, run_cat)
    del A512p2

    with open("exp_union2_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
