"""Pallas tap-stencil kernel for the 3D vacuum-PEC curl-curl/mass apply
(round-2 VERDICT item 3: the XLA-fused tap apply ran at 9.6% of its own
HBM roofline at 64^3).

Why a kernel: the round-3 layout study (bench/exp_stencil.py, _stencil2)
showed the tap arithmetic itself runs at the VPU bound when unshifted —
the entire gap is shifted-slice handling in the XLA fusion (each of the
~33 distinct shifted slices per component behaves like an extra pass).
Here the fields stream HBM->VMEM ONCE per x-block (plus two halo planes:
(BX+2)/BX read overhead), all 3x33 taps (both operators if fused) are
applied to the VMEM-resident window, and outputs stream out once.

Layout: per component, the (X, Y, Z, m) grid packs to (X, Y, Z*m) — the
z shift becomes an m-lane offset of the minor axis, y rides sublanes, x
is the grid axis. All components pad to one (NXT, Yp, ZMp) box so one
kernel serves all nine (alpha, beta) coupling groups.

Variants (static):
  pre_roll=False  taps read shifted (dy, dz) slices of the scratch window
  pre_roll=True   three z-rotations (pltpu.roll, hardware lane rotate) of
                  each field's window are materialized in scratch first;
                  taps then read dy-only shifted slices
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    *refs, taps, shapes, m, BX, Yp, ZMp, want_K, want_M, pre_roll
):
    nin = 3 * 3  # 3 fields x (main, +1 plane, +2 plane)
    in_refs = refs[:nin]
    nout = (3 if want_K else 0) + (3 if want_M else 0)
    out_refs = refs[nin : nin + nout]
    scratch = refs[nin + nout :]
    win = scratch[0]  # (3, BX+2, Yp, ZMp) or (3, 3, BX+2, Yp, ZMp)

    # assemble the (BX+2)-plane window of each field in VMEM
    for b_ in range(3):
        main, e1, e2 = in_refs[3 * b_ : 3 * b_ + 3]
        w = win.at[b_] if not pre_roll else win.at[b_, 1]
        w[0:BX, :, :] = main[...]
        w[BX : BX + 1, :, :] = e1[...]
        w[BX + 1 : BX + 2, :, :] = e2[...]
    if pre_roll:
        # z-rotations: pad lanes at both ends make the cyclic wrap a
        # correct zero fill (win[b, 1+dz] holds the dz-shifted field)
        for b_ in range(3):
            v = win[b_, 1]
            win.at[b_, 0][...] = pltpu.roll(v, m, axis=2)  # read at dz=-1
            win.at[b_, 2][...] = pltpu.roll(v, (ZMp - m) % ZMp, axis=2)

    oi = 0
    for op, want in (("K", want_K), ("M", want_M)):
        if not want:
            continue
        for alpha in range(3):
            sy, sz = shapes[alpha]
            acc = jnp.zeros((BX, sy, sz * m), jnp.float32)
            for beta, (dx, dy, dz), cK, cM in taps[alpha]:
                c = cK if op == "K" else cM
                if c == 0.0:
                    continue
                if pre_roll:
                    sl = win[
                        beta, 1 + dz,
                        1 + dx : 1 + dx + BX,
                        1 + dy : 1 + dy + sy,
                        m : m + sz * m,
                    ]
                else:
                    sl = win[
                        beta,
                        1 + dx : 1 + dx + BX,
                        1 + dy : 1 + dy + sy,
                        m + dz * m : m + dz * m + sz * m,
                    ]
                acc = acc + c * sl
            out_refs[oi][...] = acc
            oi += 1


def stencil_taps_pallas(
    grids, taps, m, want_K=True, want_M=False, BX=8, pre_roll=False,
    interpret: bool = False,
):
    """Apply the tap stencil to component grids.

    grids: (Ex, Ey, Ez) with shapes (X_a, Y_a, Z_a, m) (already masked).
    taps: StencilPencil3D.taps (static tuples).
    Returns [YK_grids][, YM_grids] matching the input shapes.
    """
    shapes = [g.shape[:3] for g in grids]
    NXO = max(s[0] for s in shapes)
    Yp = max(s[1] for s in shapes) + 2
    Zmax = max(s[2] for s in shapes)
    ZMp = (Zmax + 2) * m
    NXT = ((NXO + BX - 1) // BX) * BX + 2  # x-pad 1 each side + round up

    packed = []
    for g in grids:
        X_, Y_, Z_ = g.shape[:3]
        p = jnp.pad(
            g.reshape(X_, Y_, Z_ * m),
            (
                (1, NXT - X_ - 1),
                (1, Yp - Y_ - 1),
                (m, ZMp - (Z_ + 1) * m),
            ),
        )
        packed.append(p)

    NB = (NXT - 2) // BX
    kernel = functools.partial(
        _kernel,
        taps=taps,
        shapes=[(s[1], s[2]) for s in shapes],
        m=m, BX=BX, Yp=Yp, ZMp=ZMp,
        want_K=want_K, want_M=want_M, pre_roll=pre_roll,
    )
    in_specs = []
    args = []
    for p in packed:
        in_specs += [
            pl.BlockSpec(
                (BX, Yp, ZMp), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Yp, ZMp),
                lambda i: (i * BX + BX, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Yp, ZMp),
                lambda i: (i * BX + BX + 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        args.append(p)
        args.append(p)
        args.append(p)

    n_ops = (1 if want_K else 0) + (1 if want_M else 0)
    out_shape = []
    out_specs = []
    for _ in range(n_ops):
        for alpha in range(3):
            sy, sz = shapes[alpha][1], shapes[alpha][2]
            out_shape.append(
                jax.ShapeDtypeStruct((NB * BX, sy, sz * m), jnp.float32)
            )
            out_specs.append(
                pl.BlockSpec(
                    (BX, sy, sz * m), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
    if pre_roll:
        scratch = [pltpu.VMEM((3, 3, BX + 2, Yp, ZMp), jnp.float32)]
    else:
        scratch = [pltpu.VMEM((3, BX + 2, Yp, ZMp), jnp.float32)]

    outs = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)

    res = []
    k = 0
    for _ in range(n_ops):
        comp = []
        for alpha in range(3):
            X_, Y_, Z_ = shapes[alpha]
            comp.append(outs[k][:X_].reshape(X_, Y_, Z_, m))
            k += 1
        res.append(tuple(comp))
    return res
