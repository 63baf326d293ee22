"""SpMM kernel experiment harness (round-2 perf campaign, VERDICT.md item 1).

Measures, on the live backend, a family of Pallas blocked-ELL SpMM kernel
variants against the HBM-stream roofline for the SAME byte traffic, to find
which structural choice pays:

  v0_current   round-1 kernel (per-slot (8,8)@(8,m) einsums, python-unrolled)
  v3_stream    streaming ceiling: same value tiles, NO gather (fixed X panel)
  v4_gather    gather cost only: slices accumulated with an add, no matmul
  v1_panel     2-D value tiles (R*b, S*b); per row gather (S*b,m) panel into
               VMEM scratch then ONE (b,S*b)@(S*b,m) dot  [HIGHEST precision]
  v2_panel_d   v1 with default matmul precision
  v5_batched   3-D value tiles (R, b, S*b); stack-gather + one batched einsum

Each at m in {8, 32, 128}. Usage:  python -m maxwell_tpu.bench.exp_spmm
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def timeit_chain(fn, x0, iters=8, repeats=2):
    """Axon-proof timing: slope between k and 2k dependent in-jit chains."""
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

    from maxwell_tpu.problems import BrickCavity3D
    from maxwell_tpu.sparse.reorder import PermutedProblem
    from maxwell_tpu.sparse.bsr import BSRMatrix, bsr_matmat_ref
    from maxwell_tpu.kernels.spmm import bsr_matmat_pallas

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    only_variant = sys.argv[2] if len(sys.argv) > 2 else None
    only_m = int(sys.argv[3]) if len(sys.argv) > 3 else None

    cav = PermutedProblem(BrickCavity3D(nx=grid, ny=grid, nz=grid))
    A = BSRMatrix.from_csr(cav.K, block=8, dtype=jnp.float32)
    b, S, nbr = A.b, A.slots, A.n_brows
    R = 128 // b
    n_tiles = nbr // R
    print(
        f"n={A.n} nbr={nbr} S={S} b={b} tiles={n_tiles} "
        f"dense_nnz={A.nnz_dense} fill={A.nnz_dense/cav.K.nnz:.1f}x",
        file=sys.stderr, flush=True,
    )

    # value-bytes dominate; roofline for this layout's own traffic
    blocks2d = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(A.blocks).transpose(0, 2, 1, 3).reshape(nbr * b, S * b)
        )
    )  # row r*b+i , col s*b+k
    blocks3d = blocks2d.reshape(nbr, b, S * b)

    results = {"grid": grid, "n": A.n, "S": S, "n_tiles": n_tiles,
               "device": str(dev)}

    # ---- HBM copy roofline (cached across invocations) ----
    import os

    cached = {}
    if os.path.exists("exp_spmm_results.json"):
        with open("exp_spmm_results.json") as f:
            cached = json.load(f)
    if "hbm_GBps" in cached and cached.get("device") == str(dev):
        bw = cached["hbm_GBps"] * 1e9
    else:
        big = jnp.ones((64 * 1024 * 1024,), jnp.float32)
        t = timeit_chain(lambda x: jnp.abs(x) + 1.0, big, iters=10)
        bw = 2 * big.size * 4 / t
    results["hbm_GBps"] = bw / 1e9
    print(f"hbm copy: {bw/1e9:.1f} GB/s", file=sys.stderr, flush=True)

    def roofline(m):
        byts = A.blocks.size * 4 + A.cols.size * 4 + 2 * A.n_padded * m * 4
        return byts / bw

    # ---------------- kernel variants ----------------
    def make_v1(prec, m):
        def kernel(cols_ref, blocks_ref, x_ref, o_ref, xg):
            for r in range(R):
                def slot(s, _):
                    c = cols_ref[r, s]
                    xg[pl.ds(s * b, b), :] = x_ref[pl.ds(c * b, b), :]
                    return 0
                jax.lax.fori_loop(0, S, slot, 0, unroll=True)
                o_ref[r * b:(r + 1) * b, :] = jnp.dot(
                    blocks_ref[r * b:(r + 1) * b, :], xg[:],
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )

        @jax.jit
        def run(X):
            return pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((R, S), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((R * b, S * b), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((R * b, m), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((A.n_padded, m), jnp.float32),
                scratch_shapes=[pltpu.VMEM((S * b, m), jnp.float32)],
            )(A.cols, blocks2d, X)
        return run

    def make_v3_stream(m):
        # no gather: fixed X panel -> pure stream + matmul ceiling
        def kernel(blocks_ref, x_ref, o_ref):
            xg = x_ref[0:S * b, :]
            acc = jnp.zeros((R * b, m), jnp.float32)
            for r in range(R):
                acc = acc.at[r * b:(r + 1) * b, :].set(jnp.dot(
                    blocks_ref[r * b:(r + 1) * b, :], xg,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                ))
            o_ref[:] = acc

        @jax.jit
        def run(X):
            return pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((R * b, S * b), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((R * b, m), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((A.n_padded, m), jnp.float32),
            )(blocks2d, X)
        return run

    def make_v3b_stream_onedot(m):
        # stream ceiling with ONE (128, S*b)@(S*b, m) dot per tile
        def kernel(blocks_ref, x_ref, o_ref):
            o_ref[:] = jnp.dot(
                blocks_ref[:], x_ref[0:S * b, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        @jax.jit
        def run(X):
            return pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((R * b, S * b), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((R * b, m), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((A.n_padded, m), jnp.float32),
            )(blocks2d, X)
        return run

    def make_v4_gather(m):
        # gather cost only: accumulate slices, no value stream, no matmul
        def kernel(cols_ref, x_ref, o_ref):
            acc = jnp.zeros((b, m), jnp.float32)
            def row(r, acc):
                def slot(s, acc):
                    c = cols_ref[r, s]
                    return acc + x_ref[pl.ds(c * b, b), :]
                return jax.lax.fori_loop(0, S, slot, acc, unroll=True)
            acc = jax.lax.fori_loop(0, R, row, acc, unroll=True)
            o_ref[:] = jnp.tile(acc, (R, 1))

        @jax.jit
        def run(X):
            return pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((R, S), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((R * b, m), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((A.n_padded, m), jnp.float32),
            )(A.cols, X)
        return run

    def make_v6_smem(prec, m):
        # v5 with cols scalar reads from SMEM instead of VMEM
        def kernel(cols_ref, blocks_ref, x_ref, o_ref):
            panels = []
            for r in range(R):
                parts = [
                    x_ref[pl.ds(cols_ref[r, s] * b, b), :] for s in range(S)
                ]
                panels.append(jnp.concatenate(parts, axis=0))
            xg = jnp.stack(panels)
            acc = jnp.einsum(
                "rik,rkm->rim", blocks_ref[:], xg,
                preferred_element_type=jnp.float32, precision=prec,
            )
            o_ref[:] = acc.reshape(R * b, m)

        @jax.jit
        def run(X):
            return pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((R, S), lambda i: (i, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((R, b, S * b), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((R * b, m), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((A.n_padded, m), jnp.float32),
            )(A.cols, blocks3d, X)
        return run

    def make_v5_batched(prec, m):
        def kernel(cols_ref, blocks_ref, x_ref, o_ref):
            panels = []
            for r in range(R):
                parts = [
                    x_ref[pl.ds(cols_ref[r, s] * b, b), :] for s in range(S)
                ]
                panels.append(jnp.concatenate(parts, axis=0))  # (S*b, m)
            xg = jnp.stack(panels)  # (R, S*b, m)
            acc = jnp.einsum(
                "rik,rkm->rim", blocks_ref[:], xg,
                preferred_element_type=jnp.float32, precision=prec,
            )
            o_ref[:] = acc.reshape(R * b, m)

        @jax.jit
        def run(X):
            return pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((R, S), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((R, b, S * b), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((R * b, m), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((A.n_padded, m), jnp.float32),
            )(A.cols, blocks3d, X)
        return run

    key = jax.random.PRNGKey(0)
    HI = jax.lax.Precision.HIGHEST
    DE = jax.lax.Precision.DEFAULT

    from maxwell_tpu.sparse.bellpairs import BELLPairs
    from maxwell_tpu.kernels.spmm import bellpairs_matmat_pallas

    AP = BELLPairs.from_csr(cav.K, block=8, Cp=8, dtype=jnp.float32, B=cav.M)
    results["pairs_stored_MB"] = AP.nnz_dense * 4 / 1e6
    results["pairs_streamed_MB"] = AP.nnz_streamed * 4 / 1e6
    print(
        f"pairs: max_ch={AP.max_ch} stored={AP.nnz_dense*4/1e6:.1f}MB "
        f"streamed={AP.nnz_streamed*4/1e6:.1f}MB",
        file=sys.stderr, flush=True,
    )

    def pairs_roofline(m):
        byts = AP.nnz_streamed * 4 + AP.cols.size * 4 + 2 * AP.n_padded * m * 4
        return byts / bw

    for m in (8, 32, 64, 128):
        if only_m is not None and m != only_m:
            continue
        X = jax.random.normal(key, (A.n_padded, m), jnp.float32)
        Yref = np.asarray(bsr_matmat_ref(A, X))
        Yref_km = (
            np.asarray((cav.K + cav.M) @ np.asarray(X[: A.n], np.float64))
        )
        sol = roofline(m)
        results[f"roofline_s_m{m}"] = sol
        print(f"--- m={m}  roofline={sol*1e6:.0f}us", file=sys.stderr,
              flush=True)

        variants = {}
        if m == 8:
            variants["v0_current"] = lambda Y: bsr_matmat_pallas(A, Y)
        variants["v3_stream"] = make_v3_stream(m)
        variants["v3b_onedot"] = make_v3b_stream_onedot(m)
        variants["v4_gather"] = make_v4_gather(m)
        variants["v1_panel_hi"] = make_v1(HI, m)
        variants["v2_panel_def"] = make_v1(DE, m)
        variants["v5_batched_hi"] = make_v5_batched(HI, m)
        variants["v5_batched_def"] = make_v5_batched(DE, m)
        variants["v6_smem_hi"] = make_v6_smem(HI, m)
        variants["v7_pairs"] = lambda Y: bellpairs_matmat_pallas(AP, Y)
        from maxwell_tpu.kernels.spmm import bellpairs_km_matmat_pallas

        def km_fused(Y):
            Yk, Ym = bellpairs_km_matmat_pallas(AP, Y)
            return Yk + Ym  # keep timeit_chain shape-preserving

        variants["v9_km"] = km_fused
        results[f"pairs_roofline_s_m{m}"] = pairs_roofline(m)
        # fused roofline: both value streams + cols + X + two Y
        results[f"km_roofline_s_m{m}"] = (
            2 * AP.nnz_streamed * 4 + AP.cols.size * 4 + 3 * AP.n_padded * m * 4
        ) / bw

        for name, fn in variants.items():
            if only_variant is not None and name not in only_variant.split(","):
                continue
            tag = f"{name}_m{m}"
            try:
                t0 = time.perf_counter()
                Y = fn(X)
                np.asarray(Y.ravel()[:1])
                tc = time.perf_counter() - t0
                ok = None
                if name == "v9_km":
                    err = float(
                        np.abs(np.asarray(Y)[: A.n] - Yref_km).max()
                        / max(np.abs(Yref_km).max(), 1e-30)
                    )
                    ok = err < 1e-5
                elif not name.startswith("v3") and not name.startswith("v4"):
                    err = float(
                        np.abs(np.asarray(Y) - Yref).max()
                        / max(np.abs(Yref).max(), 1e-30)
                    )
                    ok = err < 1e-5
                t = timeit_chain(fn, X)
                results[tag] = {
                    "time_s": t, "pct_roofline": 100 * sol / t,
                    "compile_s": tc, "correct": ok,
                }
                print(
                    f"{tag:22s} {t*1e6:9.0f}us  {100*sol/t:6.1f}% SoL  "
                    f"correct={ok} (compile {tc:.0f}s)",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:
                results[tag] = {"error": repr(e)[:500]}
                print(f"{tag:22s} FAILED: {repr(e)[:200]}", file=sys.stderr,
                      flush=True)

    import os

    path = "exp_spmm_results.json"
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
