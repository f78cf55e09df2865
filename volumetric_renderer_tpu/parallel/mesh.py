"""Device mesh construction.

The reference is strictly single-device (SURVEY.md §2.4): its only
parallelism is the GPU rasterizer marching every fragment independently
(``res/shaders/volume.frag:21-51``).  Here that per-pixel independence
becomes the shardable axis: pixel tiles are distributed over a
``jax.sharding.Mesh`` and each chip marches its rows, with gradient
all-reduce (``psum``) over the mesh riding ICI.

Axis conventions:
  * ``"tiles"`` — the data-parallel pixel/ray axis (image rows).
  * ``"hosts"`` (optional, 2D mesh) — outer axis for multi-host slices;
    grid gradients reduce hierarchically (ICI within a host, DCN across).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"
HOST_AXIS = "hosts"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              shape: Optional[Tuple[int, ...]] = None,
              axis_names: Optional[Tuple[str, ...]] = None) -> Mesh:
    """Build a mesh over ``devices`` (default: all addressable devices).

    Default: a 1D mesh over every device on the ``"tiles"`` axis.  Pass
    ``shape=(hosts, chips)`` and ``axis_names=("hosts", "tiles")`` for an
    explicit 2D multi-host layout.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (devices.size,)
    if axis_names is None:
        axis_names = (TILE_AXIS,) if len(shape) == 1 else (HOST_AXIS, TILE_AXIS)
    return Mesh(devices.reshape(shape), axis_names)


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``(H, W, ...)`` images: rows split over every mesh axis."""
    return NamedSharding(mesh, P(mesh.axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_rows(h: int, mesh: Mesh) -> int:
    """Rows after padding ``h`` up to a multiple of the mesh size."""
    n = mesh.size
    return -(-h // n) * n
