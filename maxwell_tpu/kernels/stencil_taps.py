"""Pallas tap-stencil kernel for the 3D vacuum-PEC curl-curl/mass apply
(round-2 VERDICT item 3: the XLA-fused tap apply ran at 9.6% of its own
HBM roofline at 64^3).

Why a kernel: the round-3 layout study (bench/exp_stencil.py, _stencil2)
showed the tap arithmetic itself runs at the VPU bound when unshifted —
the entire gap is shifted-slice handling in the XLA fusion (each of the
~33 distinct shifted slices per component behaves like an extra pass
over HBM). Here the fields stream HBM->VMEM ONCE (rolling three-plane
window per field, maintained in scratch across grid steps), all 3x33
taps (both operators when fused) are applied to the VMEM-resident
window, and outputs stream out once.

Pipeline: grid over output x-planes. Each step's input spec fetches ONE
new plane (k+2) per field; two startup specs are clamped to planes 0/1,
so Pallas elides their refetch after the first steps. The incoming plane
lands in scratch slot (k+2) % 3; output plane k reads slots k%3,
(k+1)%3, (k+2)%3 for dx = -1/0/+1.

Layout: per component, the (X, Y, Z, m) grid packs to (X, Y, Z*m) — the
z shift becomes an m-lane offset of the minor axis, y rides sublanes.
All components pad to one (NXT, Yp, ZMp) box (minor dims rounded to the
(8, 128) vreg tile) so one kernel serves all nine (alpha, beta) coupling
groups.

Variants (static): pre_roll=True additionally materializes the three
z-rotations of each incoming plane (pltpu.roll — hardware lane rotate),
so taps read dy-only shifted slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    *refs, taps, shapes, m, Yp, ZMp, want_K, want_M, pre_roll
):
    nin = 3 * 3  # 3 fields x (incoming plane k+2, plane 0, plane 1)
    in_refs = refs[:nin]
    nout = 3 * ((1 if want_K else 0) + (1 if want_M else 0))
    out_refs = refs[nin : nin + nout]
    win = refs[nin + nout]  # (3, 3[, 3], Yp, ZMp): field, slot[, dz]
    k = pl.program_id(0)

    def _put(b_, slot, plane):
        """Store a (Yp, ZMp) plane (and its z-rolls when pre_roll) into
        the field's STATIC scratch slot."""
        if pre_roll:
            win.at[b_, slot, 1][...] = plane
            win.at[b_, slot, 0][...] = pltpu.roll(plane, m, axis=1)
            win.at[b_, slot, 2][...] = pltpu.roll(
                plane, (ZMp - m) % ZMp, axis=1
            )
        else:
            win.at[b_, slot][...] = plane

    def _mov(b_, dst, src):
        if pre_roll:
            for dz in range(3):
                win.at[b_, dst, dz][...] = win[b_, src, dz]
        else:
            win.at[b_, dst][...] = win[b_, src]

    # SHIFTING window, all indices static: slot j holds padded plane k+j
    @pl.when(k == jnp.int32(0))
    def _init():
        for b_ in range(3):
            _put(b_, 0, in_refs[3 * b_ + 1][0])
            _put(b_, 1, in_refs[3 * b_ + 2][0])

    @pl.when(k > jnp.int32(0))
    def _shift():
        for b_ in range(3):
            _mov(b_, 0, 1)
            _mov(b_, 1, 2)

    for b_ in range(3):
        _put(b_, 2, in_refs[3 * b_][0])

    oi = 0
    for op, want in (("K", want_K), ("M", want_M)):
        if not want:
            continue
        for alpha in range(3):
            sy, sz = shapes[alpha]
            acc = jnp.zeros((sy, sz * m), jnp.float32)
            for beta, (dx, dy, dz), cK, cM in taps[alpha]:
                c = cK if op == "K" else cM
                if c == 0.0:
                    continue
                if pre_roll:
                    sl = win[
                        beta, dx + 1, 1 + dz,
                        1 + dy : 1 + dy + sy,
                        m : m + sz * m,
                    ]
                else:
                    sl = win[
                        beta, dx + 1,
                        1 + dy : 1 + dy + sy,
                        m + dz * m : m + dz * m + sz * m,
                    ]
                acc = acc + c * sl
            out_refs[oi][0] = acc
            oi += 1


def stencil_taps_pallas(
    grids, taps, m, want_K=True, want_M=False, pre_roll=False,
    interpret: bool = False,
):
    """Apply the tap stencil to component grids.

    grids: (Ex, Ey, Ez) with shapes (X_a, Y_a, Z_a, m) (already masked).
    taps: StencilPencil3D.taps (static tuples).
    Returns [YK_grids][, YM_grids] matching the input shapes.
    """
    shapes = [g.shape[:3] for g in grids]
    NXO = max(s[0] for s in shapes)
    # minor dims rounded to the (8, 128) vreg tile — Mosaic requires
    # tile-aligned extents for full-ref VMEM stores
    Yp = -(-(max(s[1] for s in shapes) + 2) // 8) * 8
    Zmax = max(s[2] for s in shapes)
    ZMp = -(-((Zmax + 2) * m) // 128) * 128
    NXT = NXO + 2  # one zero plane each side

    packed = [
        jnp.pad(
            g.reshape(g.shape[0], g.shape[1], g.shape[2] * m),
            (
                (1, NXT - g.shape[0] - 1),
                (1, Yp - g.shape[1] - 1),
                (m, ZMp - (g.shape[2] + 1) * m),
            ),
        )
        for g in grids
    ]

    kernel = functools.partial(
        _kernel,
        taps=taps,
        shapes=[(s[1], s[2]) for s in shapes],
        m=m, Yp=Yp, ZMp=ZMp,
        want_K=want_K, want_M=want_M, pre_roll=pre_roll,
    )
    plane = lambda fmap: pl.BlockSpec(
        (1, Yp, ZMp), fmap, memory_space=pltpu.VMEM
    )
    in_specs = []
    args = []
    for p in packed:
        in_specs += [
            plane(lambda i: (i + 2, 0, 0)),  # incoming plane k+2
            plane(lambda i: (0, 0, 0)),  # startup plane 0 (fetch elided)
            plane(lambda i: (1, 0, 0)),  # startup plane 1 (fetch elided)
        ]
        args += [p, p, p]

    n_ops = (1 if want_K else 0) + (1 if want_M else 0)
    out_shape = []
    out_specs = []
    for _ in range(n_ops):
        for alpha in range(3):
            sy, sz = shapes[alpha][1], shapes[alpha][2]
            out_shape.append(
                jax.ShapeDtypeStruct((NXO, sy, sz * m), jnp.float32)
            )
            out_specs.append(
                pl.BlockSpec(
                    (1, sy, sz * m), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
    wdims = (3, 3, 3, Yp, ZMp) if pre_roll else (3, 3, Yp, ZMp)
    outs = pl.pallas_call(
        kernel,
        grid=(NXO,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM(wdims, jnp.float32)],
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
