"""On-chip BELLUnion measurement on the real 24^3 curl-curl operator at
several chunk widths. Usage: python -m maxwell_tpu.bench.exp_union_real [cl...]
"""
import sys, time, json
import numpy as np
import jax, jax.numpy as jnp
from maxwell_tpu.problems import BrickCavity3D
from maxwell_tpu.sparse.reorder import PermutedProblem
from maxwell_tpu.sparse.bellunion import BELLUnion
from maxwell_tpu.kernels.spmm import bellunion_matmat_pallas
from maxwell_tpu.bench.exp_gather import timeit_chain

def main():
    dev = jax.devices()[0]
    cls_ = [int(x) for x in sys.argv[1:]] or [256, 512]
    print("device", dev, file=sys.stderr, flush=True)
    t0 = time.time()
    cav = PermutedProblem(BrickCavity3D(nx=24, ny=24, nz=24))
    print(f"assemble {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    bw = 467.3e9
    rng = np.random.default_rng(0)
    res = {}
    for cl in cls_:
        t0 = time.time()
        A = BELLUnion.from_csr(cav.K, block=8, dtype=jnp.float32, chunk_lanes=cl)
        print(f"cl={cl}: build {time.time()-t0:.0f}s chunks={A.n_chunks} "
              f"storedMB={A.nnz_dense*4/1e6:.0f}", file=sys.stderr, flush=True)
        for m in (8,):
            X = jnp.asarray(rng.standard_normal((A.n_padded, m)), jnp.float32)
            roof = (A.nnz_dense*4 + A.ucols.size*4 + 2*A.n_padded*m*4)/bw
            Y = bellunion_matmat_pallas(A, X)
            Xn = np.asarray(X)[:A.n]
            ref = cav.K @ Xn.astype(np.float64)
            err = float(np.abs(np.asarray(Y)[:A.n]-ref).max()/np.abs(ref).max())
            t = timeit_chain(lambda Z: bellunion_matmat_pallas(A, Z), X)
            res[f"cl{cl}_m{m}"] = dict(time_s=t, pct=100*roof/t, err=err,
                                       nnz_per_s=cav.K.nnz/t,
                                       storedMB=A.nnz_dense*4/1e6)
            print(f"cl={cl} m={m}: {t*1e6:.0f}us {100*roof/t:.1f}% ownSoL "
                  f"err={err:.2e} {cav.K.nnz/t/1e9:.2f} Gnnz/s",
                  file=sys.stderr, flush=True)
        del A
    print(json.dumps(res))
    with open("exp_union_real_results.json", "w") as f:
        json.dump(res, f, indent=2)

if __name__ == "__main__":
    main()
