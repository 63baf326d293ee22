"""Pallas remote-DMA halo exchange (SURVEY.md §2 C8 native checklist #6:
"ICI/DCN RDMA collective halo exchange"; BASELINE.json "halo vector segments
exchanged via RDMA collectives").

`ring_shift` moves each device's buffer to its +1/-1 neighbor with ONE
explicit inter-chip DMA (`pltpu.make_async_remote_copy`) instead of an XLA
ppermute — the building block for overlap-tuned halo schedules where the
DMA is issued before interior compute and awaited after (SURVEY.md §7.5
hard part 3). The ring wraps; callers mask the chain-end garbage (banded
matrices never read past the ends).

On the CPU-simulated mesh the kernel runs in interpret mode (validated in
tests/distributed/test_rdma_halo.py); on TPU hardware it compiles to real
ICI RDMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis, ndev, shift):
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    dst = jax.lax.rem(my + jnp.int32(shift + ndev), jnp.int32(ndev))
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=dst,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


def ring_shift(
    X: jax.Array,
    axis: str,
    ndev: int,
    shift: int = 1,
    collective_id: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Inside shard_map: every device receives the X of its (index-shift)
    neighbor, transported by one remote DMA. shift=+1: data moves to the
    RIGHT (device d receives from d-1)."""
    kernel = functools.partial(
        _ring_kernel, axis=axis, ndev=ndev, shift=shift
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=interpret,
    )(X)


def exchange_halos_rdma(
    X: jax.Array, H_rows: int, axis: str, ndev: int, interpret: bool = False
):
    """(left_halo, right_halo) for a row-sharded X (n_local, m): left =
    previous device's LAST H_rows, right = next device's FIRST H_rows;
    chain ends receive zeros."""
    d = jax.lax.axis_index(axis)
    left = ring_shift(
        X[-H_rows:], axis, ndev, shift=+1, collective_id=0,
        interpret=interpret,
    )
    right = ring_shift(
        X[:H_rows], axis, ndev, shift=-1, collective_id=1,
        interpret=interpret,
    )
    left = jnp.where(d == 0, jnp.zeros_like(left), left)
    right = jnp.where(d == ndev - 1, jnp.zeros_like(right), right)
    return left, right
