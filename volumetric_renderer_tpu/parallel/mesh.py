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


def cyclic_row_layout(h: int, n_dev: int, block: int = 16):
    """Block-cyclic row assignment for load balance.

    A contiguous band split gives each chip one horizontal strip of the
    frame; the strip containing the subject then becomes the critical
    path (the volume sits mid-frame under the orbit camera) and scaling
    efficiency collapses to ~t_subject_band/t_mean.  Assigning 16-row
    blocks round-robin instead gives every chip a uniform sample of the
    frame — ``block=16`` matches the slab kernel's tile height so ray
    coherence inside each 16x16 tile is untouched.

    Returns ``(hp, perm, inv)``: rows after padding to a multiple of
    ``block * n_dev``, the permutation such that ``img[perm]`` is
    shard-order (device d owns blocks d, d+n, d+2n, ...), and its
    inverse (``img_shardorder[inv] == img``).
    """
    hp = -(-h // (block * n_dev)) * (block * n_dev)
    n_blocks = hp // block
    order = np.concatenate(
        [np.arange(d, n_blocks, n_dev) for d in range(n_dev)])
    perm = (order[:, None] * block + np.arange(block)[None, :]).reshape(-1)
    inv = np.argsort(perm)
    return hp, perm, inv
