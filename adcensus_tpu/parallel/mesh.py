"""Device mesh construction for the sharded AD-Census pipeline.

Mesh axes:
  * ``data`` — batch of stereo pairs (DCN-friendly, no intra-pair comm)
  * ``tile`` — image rows within a pair (halo exchange + volume
    resharding ride ICI)

The reference is a single CPU thread (SURVEY.md §2, "Parallelism &
communication components"); this layer is net-new.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_data: int = 1,
    n_tile: int | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, tile) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_tile is None:
        n_tile = len(devices) // n_data
    if n_data * n_tile > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_tile} exceeds {len(devices)} devices"
        )
    grid = np.asarray(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(grid, axis_names=("data", "tile"))
