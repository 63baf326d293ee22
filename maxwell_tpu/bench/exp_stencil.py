"""On-chip stencil-apply layout study at 64^3 (round-2 VERDICT item 3).

The tap apply is VPU work: ~33 taps/component x 2 flops x (n/3) rows x m
lanes ~= 66*n*m flops per operator. At the chip's ~1.9e12 f32 VPU flop/s
that is a COMPUTE bound of 66*n*m/1.9e12 s — at 64^3, m=8: ~0.23 ms vs the
2*n*m*4/BW = 0.106 ms HBM roofline, i.e. a perfect VPU tap apply tops out
near 46% of the memory roofline. The measured 9.6% (round 2) means ~20%
VPU efficiency; prime suspect is lane waste: layout (m, x, y, z) puts
z=66 on the 128-lane axis (52% idle) and y=66 on 8-sublane tiles (pad 72).

Variants measured here:
  s0  current taps K-only          (m, x, y, z)    [baseline]
  s1  current taps KM fused
  s2  einsum 12-panel MXU path K-only (gather/scatter + (12,12) einsum)
  s3  zm-packed taps K-only        (x, y, z*m): z shifts = m-lane
      rotations, minor dim (nz+1)*m = 520 lanes (81% packed), y on
      sublanes
  s4  zm-packed taps KM fused
  s5  pure-VPU probe: 33 unshifted FMAs on the s3-shaped arrays (what the
      tap count costs with NO shift/alignment overhead at this layout)

Usage: python -m maxwell_tpu.bench.exp_stencil [grid [m]]
Writes exp_stencil_results.json.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from maxwell_tpu.bench.exp_gather import timeit_chain
from maxwell_tpu.problems.stencil3d import StencilPencil3D


def taps_zm(stp, X, want_K=True, want_M=False):
    """Tap apply with the (x, y, z*m) packed layout."""
    vec = X.ndim == 1
    Xl = (X[:, None] if vec else X) * stp.mask[:, None]
    m = Xl.shape[1]
    grids = stp._to_grids(Xl)
    shapes = [g.shape for g in grids]
    P = [
        jnp.pad(
            g.reshape(g.shape[0], g.shape[1], g.shape[2] * m),
            ((1, 1), (1, 1), (m, m)),
        )
        for g in grids
    ]
    outK, outM = [], []
    for alpha in range(3):
        s = shapes[alpha]
        accK = jnp.zeros((s[0], s[1], s[2] * m), Xl.dtype)
        accM = accK
        for beta, (dx, dy, dz), cK, cM in stp.taps[alpha]:
            sl = P[beta][
                1 + dx : 1 + dx + s[0],
                1 + dy : 1 + dy + s[1],
                m + dz * m : (1 + dz) * m + s[2] * m,
            ]
            if want_K and cK != 0.0:
                accK = accK + cK * sl
            if want_M and cM != 0.0:
                accM = accM + cM * sl
        outK.append(accK)
        outM.append(accM)

    def pack(Ys):
        out = jnp.concatenate([Y.reshape(-1, m) for Y in Ys], axis=0)
        pad = stp.n_padded - stp.n
        if pad:
            out = jnp.pad(out, ((0, pad), (0, 0)))
        out = out * stp.mask[:, None]
        return out[:, 0] if vec else out

    return (
        pack(outK) if want_K else None,
        pack(outM) if want_M else None,
    )


def vpu_probe(stp, X):
    """33 unshifted FMAs per component on s3-shaped arrays: the pure tap
    arithmetic with zero shift/slice overhead (upper bound of any tap
    reorganization at this layout)."""
    m = X.shape[1]
    grids = stp._to_grids(X * stp.mask[:, None])
    outs = []
    for alpha, g in enumerate(grids):
        v = g.reshape(g.shape[0], g.shape[1], -1)
        acc = jnp.zeros_like(v)
        for t, (beta, d, cK, cM) in enumerate(stp.taps[alpha]):
            acc = acc + (cK + t) * v
        outs.append(acc)
    out = jnp.concatenate([o.reshape(-1, m) for o in outs], axis=0)
    pad = stp.n_padded - stp.n
    if pad:
        out = jnp.pad(out, ((0, pad), (0, 0)))
    return out


def main():
    dev = jax.devices()[0]
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print("device", dev, "grid", grid, "m", m, file=sys.stderr, flush=True)
    bw = 491.8e9  # measured HBM copy BW, bench_details r02
    vpu = 1.9e12  # nominal f32 VPU flop/s (v5e: 8 sublanes*128 lanes*2*~0.9GHz)

    stp = StencilPencil3D.build(nx=grid, ny=grid, nz=grid, dtype=jnp.float32)
    n = stp.n
    ntaps = sum(len(t) for t in stp.taps)
    ntapsK = sum(1 for t in stp.taps for e in t if e[2] != 0.0)
    ntapsM = sum(1 for t in stp.taps for e in t if e[3] != 0.0)
    print(f"n={n} taps={ntaps} (K {ntapsK}, M {ntapsM})", file=sys.stderr,
          flush=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((stp.n_padded, m)), jnp.float32)

    roof1 = 2 * stp.n_padded * m * 4 / bw  # one operator: field in + out
    roof2 = 3 * stp.n_padded * m * 4 / bw  # KM fused: in + 2 out
    flops1 = 2 * ntapsK * (n / 3) * m
    flops2 = 2 * (ntapsK + ntapsM) * (n / 3) * m
    res = {
        "grid": grid, "m": m, "n": n, "taps": ntaps,
        "roof_K_s": roof1, "roof_KM_s": roof2,
        "vpu_bound_K_s": flops1 / vpu, "vpu_bound_KM_s": flops2 / vpu,
    }

    # correctness of the zm variant vs the production taps
    YK = np.asarray(stp.K_mm(X))
    YK2 = np.asarray(taps_zm(stp, X)[0])
    err = float(np.abs(YK - YK2).max() / np.abs(YK).max())
    assert err < 1e-6, err
    print(f"zm parity err {err:.2e}", file=sys.stderr, flush=True)

    cases = {
        "s0_taps_K": lambda Y: stp.K_mm(Y),
        "s1_taps_KM": lambda Y: (lambda a, b: a + b)(*stp.KM_mm(Y)),
        "s2_einsum_K": lambda Y: stp._element_apply(stp.Ke, Y),
        "s3_zm_K": lambda Y: taps_zm(stp, Y)[0],
        "s4_zm_KM": lambda Y: (lambda a, b: a + b)(
            *taps_zm(stp, Y, True, True)
        ),
        "s5_vpu_probe": lambda Y: vpu_probe(stp, Y),
    }
    for name, fn in cases.items():
        t0 = time.time()
        try:
            t = timeit_chain(fn, X, iters=4)
        except Exception as e:
            res[name] = {"error": repr(e)[:200]}
            print(f"{name}: ERROR {e!r}", file=sys.stderr, flush=True)
            continue
        roof = roof2 if ("KM" in name) else roof1
        vb = res["vpu_bound_KM_s"] if "KM" in name else res["vpu_bound_K_s"]
        res[name] = {
            "time_s": t,
            "pct_own_roofline": 100 * roof / t,
            "pct_vpu_bound": 100 * vb / t,
            "compile_s": time.time() - t0,
        }
        print(
            f"{name}: {t*1e6:.0f}us {100*roof/t:.1f}% ownSoL "
            f"{100*vb/t:.1f}% of VPU bound",
            file=sys.stderr, flush=True,
        )

    print(json.dumps(res))
    with open("exp_stencil_results.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
