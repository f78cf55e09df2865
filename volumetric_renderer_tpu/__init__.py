"""volumetric_renderer_tpu — a TPU-native differentiable volume renderer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
C++/Vulkan application ``TomBeacock/volumetric-renderer`` (interactive scalar-
volume ray-marching with a user-editable transfer function), re-designed
TPU-first:

  * the fragment-shader ray-march (``res/shaders/volume.frag``) becomes a
    fused compute kernel (``kernels/``) with a pure-``jnp`` oracle (``core/``),
  * the Vulkan 3D/1D textures become sharded ``jnp`` arrays (``data/``,
    ``transfer/``),
  * the ImGui transfer-function editor becomes a differentiable 1D TF table,
  * single-GPU rasterizer parallelism becomes pixel-tile sharding over a
    ``jax.sharding.Mesh`` with psum'd parameter gradients (``parallel/``).

Everything in the compute path is differentiable: pixel losses backpropagate
to the voxel grid and the transfer-function table.
"""

__version__ = "0.1.0"

from volumetric_renderer_tpu.utils.config import RenderSettings
from volumetric_renderer_tpu.scene.camera import OrbitCamera
from volumetric_renderer_tpu.transfer.gradient import Gradient
from volumetric_renderer_tpu.data.volume import Volume
from volumetric_renderer_tpu.render.api import render, render_loss_and_grads

__all__ = [
    "RenderSettings",
    "OrbitCamera",
    "Gradient",
    "Volume",
    "render",
    "render_loss_and_grads",
]
