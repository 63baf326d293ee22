"""Mesh construction helpers (SURVEY.md §2 C15: the partitioner is a Mesh +
PartitionSpec, not a code path)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

ROW_AXIS = "rows"


def make_mesh(n_devices: int | None = None, axis: str = ROW_AXIS) -> Mesh:
    """1-D device mesh over the block-row axis.

    n_devices defaults to all visible devices. On a multi-host pod slice the
    same call spans hosts (jax.devices() is global) — DP over rows rides ICI
    within a slice and DCN across slices with no code change (SURVEY.md §5.8).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis,))
