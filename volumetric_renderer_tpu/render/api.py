"""Public render API.

The functional equivalent of the reference's render loop
(``OffscreenPass::record`` -> ``volume.frag``): one call renders one frame.
The interactive mutation entry points (``volume_dataset_changed``,
``transfer_function_changed``, ``slicing_changed``,
``framebuffer_size_changed`` — ``src/rendering/offscreen_pass.h:46-54``)
collapse into plain function arguments: pass a different volume / TF table /
slicing window / ``RenderSettings`` and you have "mutated" the renderer.

Methods:
  * ``"oracle"`` — pure ``lax.scan`` marcher, plain autodiff.  Ground truth.
  * ``"fused"``  — same math behind a custom VJP whose backward re-marches
    (O(1) memory in step count).  Default for optimization.
  * ``"blocked"`` — fused math with per-row-block adaptive trip counts
    (``while_loop``): background blocks skip the march entirely, saturated
    blocks stop early.  Fastest pure-XLA path.
  * ``"slab"`` (alias ``"pallas"``) — the production TPU Pallas kernel
    (``kernels/slab.py``): the volume streams through VMEM in z-slabs and
    trilinear + TF lookups run as MXU one-hot matmuls.  Fastest on TPU;
    needs a concrete camera (slab order is a compile-time property).
    ``slab_mode="exact"`` matches the XLA paths to ~1e-6; ``"fast"``
    (bf16x3 matmuls) is ~1.7x faster at ~1e-3 error — under half an 8-bit
    display quantum.  Backward is the TPU-native Pallas slab backward
    (``kernels.slab.make_slab_bwd``: re-march with VMEM-accumulated
    voxel/TF gradient slabs).
  * ``"auto"`` (default) — the production slab kernel when it applies
    (TPU backend + concrete camera), otherwise ``"fused"``.  A TPU user
    gets the fast path without knowing its name.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from volumetric_renderer_tpu.core.fused import make_fused_marcher
from volumetric_renderer_tpu.core.marcher import march_rays
from volumetric_renderer_tpu.scene.camera import OrbitCamera, ray_grid
from volumetric_renderer_tpu.utils.config import RenderSettings


def resolve_method(camera) -> str:
    """Resolve ``method="auto"``: the slab Pallas kernel when it applies
    (TPU backend + a concrete camera to fix the slab order at trace time),
    else the fused XLA path.  Mirrors what ``bench.py`` and
    ``__graft_entry__`` pick by hand."""
    import jax

    if jax.default_backend() != "tpu":
        return "fused"
    try:
        import numpy as _np

        _np.asarray(camera.orientation)  # traced cameras raise here
    except Exception:
        return "fused"
    return "slab"


def _prep(vol, camera, settings, density_min, density_max, slice_min, slice_max):
    if density_min is None:
        density_min = jnp.min(vol)
    if density_max is None:
        density_max = jnp.max(vol)
    if slice_min is None:
        slice_min = jnp.zeros(3, jnp.float32)
    if slice_max is None:
        slice_max = jnp.ones(3, jnp.float32)
    origin_world, dirs = ray_grid(
        camera, settings.height, settings.width,
        settings.fov_y_degrees, settings.near, settings.far,
    )
    return (
        origin_world + 0.5,  # world cube [-0.5,0.5]^3 -> texture space
        dirs,
        jnp.asarray(density_min, jnp.float32),
        jnp.asarray(density_max, jnp.float32),
        jnp.asarray(slice_min, jnp.float32),
        jnp.asarray(slice_max, jnp.float32),
    )


def render(
    vol: jnp.ndarray,
    tf_table: jnp.ndarray,
    camera: OrbitCamera,
    settings: RenderSettings = RenderSettings(),
    *,
    density_min=None,
    density_max=None,
    slice_min=None,
    slice_max=None,
    method: str = "auto",
    slab_mode: str = "fast",
    interpret: bool = False,
    tf_srgb: bool = False,
) -> jnp.ndarray:
    """Render one ``(H, W, 4)`` RGBA frame.

    ``vol``: float32 ``(Z, Y, X)`` density grid.  ``tf_table``: float32
    ``(N, 4)`` RGBA transfer function (see ``transfer``).  RGB is the
    front-to-back accumulation, alpha is opacity; composite over a
    background with :func:`composite_over`.

    ``slab_mode`` (slab/pallas/auto-on-TPU only) sets the kernel's matmul
    precision.  The default ``"fast"`` (single-pass bf16) errs ~5e-4 vs
    the f32 oracle — under half an 8-bit display quantum (1/255), i.e.
    invisible in any displayed image — and is ~3x faster on hardware than
    ``"exact"`` (bf16x6, reproduces f32 to ~1e-6).  Use ``"exact"`` for
    numerical parity work; gradients are unaffected (the backward's
    density recompute is exact-pinned in every bwd mode but "fast",
    ``kernels/slab.py``).

    ``tf_srgb=True`` treats the TF table's RGB as sRGB-encoded and decodes
    it before lookup — byte-for-byte the reference's ``R8G8B8A8_SRGB`` TF
    sampler (``offscreen_pass.cpp:1076``), which linearizes texels ahead
    of the linear filter.  The default (False) is this framework's
    linear-throughout convention (SURVEY §7.4.6).
    """
    if tf_srgb:
        from volumetric_renderer_tpu.utils.color import linearize_tf_table

        tf_table = linearize_tf_table(tf_table)
    if method == "auto":
        method = resolve_method(camera)
        if method == "slab":
            from volumetric_renderer_tpu.kernels.slab import (
                choose_axis_from_camera, count_envelope_violations,
            )

            axis, reverse = choose_axis_from_camera(camera)
            if count_envelope_violations(
                    camera, settings.height, settings.width, axis, reverse,
                    settings.fov_y_degrees, settings.near, settings.far):
                method = "fused"  # auto never raises: quiet fallback
    origin, dirs, dmin, dmax, smin, smax = _prep(
        vol, camera, settings, density_min, density_max, slice_min, slice_max
    )
    if method == "oracle":
        return march_rays(
            vol, tf_table, origin, dirs,
            density_min=dmin, density_max=dmax,
            slice_min=smin, slice_max=smax,
            num_steps=settings.num_steps, step_size=settings.step_size,
            early_termination=settings.early_termination,
            termination_eps=settings.termination_eps,
        )
    if method == "fused":
        marcher = make_fused_marcher(
            settings.num_steps, settings.step_size,
            settings.early_termination, settings.termination_eps,
        )
        return marcher(vol, tf_table, origin, dirs, dmin, dmax, smin, smax)
    if method == "blocked":
        from volumetric_renderer_tpu.core.blocked import make_blocked_marcher

        marcher = make_blocked_marcher(
            settings.num_steps, settings.step_size,
            settings.early_termination, settings.termination_eps,
        )
        return marcher(vol, tf_table, origin, dirs, dmin, dmax, smin, smax)
    if method in ("slab", "pallas"):
        from volumetric_renderer_tpu.kernels.slab import (
            choose_axis_from_camera, count_envelope_violations,
            make_slab_marcher,
        )

        axis, reverse = choose_axis_from_camera(camera)
        n_bad = count_envelope_violations(
            camera, settings.height, settings.width, axis, reverse,
            settings.fov_y_degrees, settings.near, settings.far)
        if n_bad:
            raise ValueError(
                f"method='slab' cannot render this frame: {n_bad} "
                "cube-hitting rays oppose the slab march direction "
                "(camera too close to / inside the volume, or FoV too "
                "wide).  Use method='fused' or 'blocked'.")
        marcher = make_slab_marcher(
            settings.num_steps, settings.step_size,
            settings.early_termination, settings.termination_eps,
            tuple(vol.shape), tf_table.shape[0],
            settings.height, settings.width,
            axis=axis, reverse=reverse, mode=slab_mode,
            interpret=interpret,
        )
        return marcher(vol, tf_table, origin, dirs, dmin, dmax, smin, smax)
    raise ValueError(f"unknown method {method!r}")


def composite_over(rgba: jnp.ndarray, background, reference_blend: bool = False):
    """Composite a rendered frame over an RGB background.

    The renderer's RGB output is premultiplied-by-construction (each sample
    adds ``T * a * c``), so the correct operator is
    ``rgb + bg * (1 - alpha)``.  The reference instead configures standard
    (non-premultiplied) alpha blending over its 0.11-gray clear color
    (``offscreen_pass.cpp:171``, blend state ``offscreen_pass.cpp:715-726``),
    i.e. ``rgb * alpha + bg * (1 - alpha)`` — double-weighting the volume
    color by alpha.  Pass ``reference_blend=True`` to reproduce that quirk.
    """
    bg = jnp.asarray(background, jnp.float32)
    a = rgba[..., 3:4]
    if reference_blend:
        return rgba[..., :3] * a + bg * (1.0 - a)
    return rgba[..., :3] + bg * (1.0 - a)


def adjust_display(rgb: jnp.ndarray, brightness: float = 0.0,
                   contrast: float = 0.0):
    """Display-space brightness/contrast post-process.

    The reference shows Brightness/Contrast sliders in its Display panel
    but never pushes them to the renderer — they are UI-only dead state
    (static locals, ``src/ui/main_window.cpp:191-205``).  Here they work:
    ``out = (rgb - 0.5) * (1 + contrast) + 0.5 + brightness``, clipped to
    [0, 1], applied after :func:`composite_over`.
    """
    out = (rgb - 0.5) * (1.0 + contrast) + 0.5 + brightness
    return jnp.clip(out, 0.0, 1.0)


def render_loss_and_grads(
    vol, tf_table, camera, target,
    settings: RenderSettings = RenderSettings(),
    *,
    loss: str = "l2",
    method: str = "fused",
    **kw,
):
    """Convenience: pixel loss against ``target`` plus grads w.r.t.
    ``(vol, tf_table)``.  Used by the TF-fit and grid-inversion apps."""
    import jax

    def loss_fn(v, tf):
        img = render(v, tf, camera, settings, method=method, **kw)
        diff = img[..., :3] - target[..., :3]
        if loss == "l2":
            return 0.5 * jnp.mean(diff * diff)
        if loss == "l1":
            return jnp.mean(jnp.abs(diff))
        raise ValueError(f"unknown loss {loss!r}")

    (value, grads) = jax.value_and_grad(loss_fn, argnums=(0, 1))(vol, tf_table)
    return value, grads
