"""In-Pallas shift-cost microbenchmark for the tap stencil (round-2 VERDICT
item 3, follow-up to exp_stencil.py).

exp_stencil showed the tap arithmetic runs at the VPU bound when UNSHIFTED
(s5 probe: 196us at 64^3 m=8) but the production apply runs 6x slower —
the cost is entirely in the shifted-slice reads. This experiment measures,
inside a Pallas kernel over x-planes of a (66, 66, 528)-shaped field
((y, z*m) minor layout, VMEM-resident blocks):

  p0  33 unshifted FMAs per plane               (pallas overhead + FMA rate)
  p1  33 FMAs with dz lane-offset reads          (z shifts = +-m lanes)
  p2  33 FMAs with dy sublane + dz lane offsets  (the real tap pattern)
  p3  p2 + three x-planes (dx in {-1,0,1}), 11 taps each = 33

Usage: python -m maxwell_tpu.bench.exp_stencil2 [grid [m [cases...]]]
"""
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maxwell_tpu.bench.exp_gather import timeit_chain


def _mk(case, Y, ZM, m):
    def kern(x0_ref, x1_ref, x2_ref, o_ref):
        acc = jnp.zeros((Y, ZM), jnp.float32)
        if case == "p0":
            v1 = x1_ref[0, 1:1 + Y, m:m + ZM]
            for t in range(33):
                acc += (1.0 + t) * v1
        elif case == "p1":
            for t in range(33):
                dz = (t % 3) - 1
                acc += (1.0 + t) * x1_ref[0, 1:1 + Y, m + dz * m:
                                          m + dz * m + ZM]
        elif case == "p2":
            for t in range(33):
                dz = (t % 3) - 1
                dy = ((t // 3) % 3) - 1
                acc += (1.0 + t) * x1_ref[0, 1 + dy:1 + dy + Y,
                                          m + dz * m: m + dz * m + ZM]
        elif case == "p3":
            for t, xr in enumerate((x0_ref, x1_ref, x2_ref)):
                for s in range(11):
                    dz = (s % 3) - 1
                    dy = ((s // 3) % 3) - 1
                    acc += (1.0 + t + s) * xr[0, 1 + dy:1 + dy + Y,
                                              m + dz * m: m + dz * m + ZM]
        elif case == "p4":  # dy (sublane) shifts only — 3 distinct reads
            for t in range(33):
                dy = (t % 3) - 1
                acc += (1.0 + t) * x1_ref[0, 1 + dy:1 + dy + Y, m:m + ZM]
        elif case == "p5":  # dz shifts via hardware lane ROTATE: the pad
            # lanes at both ends make the cyclic wrap a correct zero fill
            # (roll requires non-negative shifts: roll by L-s == roll -s)
            v = x1_ref[0, 1:1 + Y, :]
            L = ZM + 2 * m
            vm = pltpu.roll(v, m, axis=1)  # dz = -1
            vp = pltpu.roll(v, L - m, axis=1)  # dz = +1
            sls = (vm[:, m:m + ZM], v[:, m:m + ZM], vp[:, m:m + ZM])
            for t in range(33):
                acc += (1.0 + t) * sls[t % 3]
        else:  # p6: full tap pattern, dz via lane roll, dy via sublane roll
            L = ZM + 2 * m
            for t, xr in enumerate((x0_ref, x1_ref, x2_ref)):
                v = xr[0]
                rolls = {}
                for dz in (-1, 0, 1):
                    vz = pltpu.roll(v, (-dz * m) % L, axis=1) if dz else v
                    for dy in (-1, 0, 1):
                        vy = (
                            pltpu.roll(vz, (-dy) % (Y + 2), axis=0)
                            if dy else vz
                        )
                        rolls[(dy, dz)] = vy[1:1 + Y, m:m + ZM]
                for s in range(11):
                    dz = (s % 3) - 1
                    dy = ((s // 3) % 3) - 1
                    acc += (1.0 + t + s) * rolls[(dy, dz)]
        o_ref[0] = acc

    return kern


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dev = jax.devices()[0]
    print("device", dev, file=sys.stderr, flush=True)
    Y = grid + 2
    ZM = (grid + 2) * m
    NX = grid + 2
    rng = np.random.default_rng(0)
    # padded field: (NX+2, Y+2, ZM+2m) so every slice is in range
    X = jnp.asarray(
        rng.standard_normal((NX + 2, Y + 2, ZM + 2 * m)), jnp.float32
    )
    vpu = 1.9e12
    flops = 2 * 33 * NX * Y * ZM
    res = {"grid": grid, "m": m, "vpu_bound_s": flops / vpu}

    cases = sys.argv[3:] or ["p0", "p1", "p2", "p3", "p4", "p5", "p6"]
    if os.path.exists("exp_stencil2_results.json"):
        with open("exp_stencil2_results.json") as fh:
            res.update(json.load(fh))
    for case in cases:
        kern = _mk(case, Y, ZM, m)
        spec = lambda off: pl.BlockSpec(
            (1, Y + 2, ZM + 2 * m), lambda i: (i + off, 0, 0),
            memory_space=pltpu.VMEM,
        )
        f = pl.pallas_call(
            kern,
            grid=(NX,),
            in_specs=[spec(0), spec(1), spec(2)],
            out_specs=pl.BlockSpec(
                (1, Y, ZM), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((NX, Y, ZM), jnp.float32),
        )
        t0 = time.time()
        t = timeit_chain(
            lambda Z: jnp.pad(f(Z, Z, Z), ((2, 0), (2, 0), (2 * m, 0))), X,
            iters=8,
        )
        res[case] = {
            "time_s": t,
            "pct_vpu_bound": 100 * (flops / vpu) / t,
            "compile_s": time.time() - t0,
        }
        print(f"{case}: {t*1e6:.0f}us {100*(flops/vpu)/t:.1f}% of VPU bound",
              file=sys.stderr, flush=True)
        with open("exp_stencil2_results.json", "w") as fh:
            json.dump(res, fh, indent=2)

    print(json.dumps(res))
    with open("exp_stencil2_results.json", "w") as f_:
        json.dump(res, f_, indent=2)


if __name__ == "__main__":
    main()
