"""Round-5 union-kernel closing study (round-4 VERDICT item 3: recorded
>=70% of own roofline). The production kernel (cl=1024, pack=2,
concatenate gather) sits ~0.2-0.3 ms above its ~0.5 ms HBM stream floor
at 24^3/m=8. Variants attack the remaining fixed costs:

  prod          shipping kernel (baseline, median of 3)
  pack4         aligned runs of 4 block-cols: 32 gather slices per chunk
                instead of 64 (fill 1.30x -> more bytes, fewer copies)
  pack8         aligned runs of 8: 16 slices per chunk (fill grows more)
  prec_default  production gather, DEFAULT dot precision (bf16 passes) -
                accuracy probe: is HIGHEST needed for the f32 solver
                contract (~1e-7 apply err)?
  m128          X widened to m=128 lanes (the gather copies' lane
                utilization is 8/128 at m=8) - quantifies how much of
                the overhead is lane-padding waste vs per-slice fixed
                cost. Not a production row (LOBPCG m is small); a
                diagnostic.

Each reports: time (median of 3), true nnz/s, pct of own roofline
(own bytes = stored values + ucols + X/Y), max rel err vs scipy.

Usage: timeout 2400 python -m maxwell_tpu.bench.exp_r5union
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from maxwell_tpu.bench.exp_gather import timeit_chain
    from maxwell_tpu.kernels.spmm import bellunion_matmat_pallas
    from maxwell_tpu.problems import BrickCavity3D
    from maxwell_tpu.sparse.bellunion import BELLUnion
    from maxwell_tpu.sparse.reorder import PermutedProblem

    dev = jax.devices()[0]
    cav = PermutedProblem(BrickCavity3D(nx=24, ny=24, nz=24))
    Kcsr = cav.K.tocsr()
    nnz = int(Kcsr.nnz)
    rng = np.random.default_rng(0)

    big = jnp.ones((64 * 1024 * 1024,), jnp.float32)
    bws = []
    for _ in range(3):
        t_h = timeit_chain(lambda x: jnp.abs(x) + 1.0, big)
        bws.append(2 * big.size * 4 / t_h)
    bw = float(np.median(bws))
    print(f"device={dev} bw={bw/1e9:.1f} GB/s nnz={nnz}",
          file=sys.stderr, flush=True)
    results = {"device": str(dev), "bw_GBps": bw / 1e9, "nnz": nnz}

    def report(name, A, fn, m=8):
        X = jnp.asarray(
            rng.standard_normal((A.n_cols_padded, m)), jnp.float32
        )
        Yref = Kcsr @ np.asarray(X[: Kcsr.shape[1]], np.float64)
        try:
            t0 = time.perf_counter()
            Y = fn(A, X)
            np.asarray(Y.ravel()[:1])
            t_compile = time.perf_counter() - t0
            err = float(
                np.abs(np.asarray(Y)[: Kcsr.shape[0]] - Yref).max()
                / np.abs(Yref).max()
            )
            ts = [timeit_chain(lambda Z: fn(A, Z), X) for _ in range(3)]
            t = float(np.median(ts))
            bytes_own = (
                A.vals.size * 4 + A.ucols.size * 4
                + 2 * A.n_padded * m * 4
            )
            row = {
                "time_s": t,
                "pct": 100.0 * (bytes_own / bw) / t,
                "err": err,
                "nnz_per_s": nnz / t,
                "storedMB": A.vals.size * 4 / 1e6,
                "compile_s": t_compile,
                "n_chunks": int(A.n_chunks),
            }
            results[name] = row
            print(f"{name}: {t*1e6:.0f}us {row['pct']:.1f}% "
                  f"err={err:.1e} {nnz/t/1e9:.2f}Gnnz/s "
                  f"stored={row['storedMB']:.0f}MB",
                  file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": repr(e)[:200]}
            print(f"{name}: FAILED {e!r}"[:200], file=sys.stderr,
                  flush=True)

    A2 = BELLUnion.from_csr(Kcsr, block=8, dtype=jnp.float32)  # prod
    report("prod", A2, lambda A, X: bellunion_matmat_pallas(A, X))
    report(
        "prec_default", A2,
        lambda A, X: bellunion_matmat_pallas(A, X, precision="default"),
    )
    report("m128_diag", A2,
           lambda A, X: bellunion_matmat_pallas(A, X), m=128)

    for p in (4, 8):
        try:
            Ap = BELLUnion.from_csr(
                Kcsr, block=8, dtype=jnp.float32, pack=p
            )
            report(f"pack{p}", Ap,
                   lambda A, X: bellunion_matmat_pallas(A, X))
            del Ap
        except Exception as e:
            results[f"pack{p}"] = {"error": repr(e)[:200]}
            print(f"pack{p} build FAILED {e!r}"[:200], file=sys.stderr,
                  flush=True)

    print(json.dumps(results))
    with open("exp_r5union_results.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
