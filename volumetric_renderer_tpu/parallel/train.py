"""Sharded optimization loops: TF-fit and voxel-grid inversion.

BASELINE configs 3-4: recover a transfer function (or the whole density
grid) from target images by pixel-loss gradient descent.  These are the
north-star capabilities the reference lacks entirely — its TF editing is a
human dragging markers (``src/ui/components/gradient.cpp:134-469``); here
the TF table and the grid are parameters of a differentiable renderer.

Sharding: pixels/tiles over the mesh (forward communication-free), grid/TF
gradients all-reduced by the AD transpose of replication (psum over ICI).

``method="slab"`` trains through the production Pallas kernel (forward
slab kernel + Pallas slab backward, ``kernels/slab.py``).  The slab order
is a compile-time property, and posed views look along different volume
axes, so the step compiles one kernel per orientation the cameras need
(:func:`slab_axes_for_cameras`) and ``lax.switch``es per view on a traced
``axis_codes`` array carried in ``fixed``.

``row_layout="cyclic"`` trains on shard-ordered images (16-row blocks
round-robin over chips, the load-balanced layout) — the loss permutes the
*targets* to match (a free static gather on replicated data), so the
forward stays collective-free.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from volumetric_renderer_tpu.parallel.mesh import make_layout
from volumetric_renderer_tpu.parallel.render import make_sharded_renderer
from volumetric_renderer_tpu.utils.config import RenderSettings


class TrainState(NamedTuple):
    params: dict          # {"vol": (Z,Y,X)?, "tf": (N,4)?} — what's optimized
    opt_state: optax.OptState
    step: jnp.ndarray


def slab_axes_for_cameras(cams) -> tuple:
    """Map concrete posed cameras to slab orientations.

    Returns ``(axis_codes, slab_axes)``: ``slab_axes`` is the ordered
    tuple of unique ``(axis, reverse)`` pairs the views need (one compiled
    kernel each), ``axis_codes`` an ``(V,)`` int32 array indexing into it
    per view — the traced selector for the per-view ``lax.switch``.
    """
    from volumetric_renderer_tpu.kernels.slab import choose_axis_from_camera

    pairs = [choose_axis_from_camera(c) for c in cams]
    uniq = sorted(set(pairs))
    codes = np.asarray([uniq.index(p) for p in pairs], np.int32)
    return jnp.asarray(codes), tuple(uniq)


def make_train_step(mesh, settings: RenderSettings, optimizer,
                    *, optimize_vol: bool, optimize_tf: bool,
                    method: str = "fused", vol_shape=None,
                    slab_axes: tuple = (), slab_mode: str = "exact",
                    interpret: bool = False,
                    row_layout: str = "contiguous"):
    """Build ``(state, fixed, cameras, targets) -> (state, loss)``.

    ``cameras`` is an ``OrbitCamera`` pytree with a leading batch axis (one
    entry per posed view; batch=1 for TF-fit).  ``targets`` is
    ``(V, H, W, 4)``.  ``fixed`` carries whichever of vol/tf is not being
    optimized plus the density window — and, for ``method="slab"``, the
    per-view ``axis_codes`` from :func:`slab_axes_for_cameras`.  Views are
    scanned (grid gradients accumulate across views); pixels within a view
    are mesh-sharded.
    """
    h, w = settings.height, settings.width
    shardorder = row_layout != "contiguous"
    if shardorder:
        # train on shard-order images: targets are packed with the same
        # static gather (free on replicated data) and padded positions are
        # masked out of the loss, so the forward stays collective-free
        _, _, pack_img, _, valid = make_layout(row_layout, h, w, mesh.size)
        vmask = valid[..., None]

    common = dict(row_layout=row_layout, permuted_output=shardorder)
    if method in ("slab", "pallas"):
        if not slab_axes:
            raise ValueError("method='slab' needs slab_axes= "
                             "(slab_axes_for_cameras on the posed views)")
        if vol_shape is None:
            raise ValueError("method='slab' needs vol_shape= (static)")
        render_fns = [
            make_sharded_renderer(mesh, settings, "slab",
                                  vol_shape=tuple(vol_shape), slab_axis=a,
                                  slab_reverse=r, slab_mode=slab_mode,
                                  interpret=interpret, **common)
            for (a, r) in slab_axes
        ]
    else:
        render_fns = [make_sharded_renderer(mesh, settings, method,
                                            **common)]

    def loss_fn(params, fixed, cameras, targets):
        vol = params["vol"] if optimize_vol else fixed["vol"]
        tf = params["tf"] if optimize_tf else fixed["tf"]

        def one_view(i, carry):
            cam = jax.tree.map(lambda x: x[i], cameras)
            target = targets[i]
            fargs = (vol, tf, cam, fixed["dmin"], fixed["dmax"],
                     fixed["smin"], fixed["smax"])
            if len(render_fns) == 1:
                img = render_fns[0](*fargs)
            else:
                # pick the kernel compiled for this view's slab orientation
                img = jax.lax.switch(
                    fixed["axis_codes"][i],
                    [functools.partial(f, *fargs) for f in render_fns])
            if shardorder:
                sq = ((img - pack_img(target)) ** 2) * vmask
                return carry + jnp.sum(sq) / float(h * w * 4)
            return carry + jnp.mean((img - target) ** 2)

        # fori_loop, NOT lax.scan — scan bodies containing the gather-heavy
        # render trigger a pathologically slow TPU compile (core.marcher)
        total = jax.lax.fori_loop(0, targets.shape[0], one_view,
                                  jnp.float32(0.0))
        return total / targets.shape[0]

    @jax.jit
    def train_step(state: TrainState, fixed, cameras, targets):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, fixed, cameras, targets)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        if optimize_tf:
            # keep the TF a physical RGBA table (matches the reference's
            # unorm texture range, offscreen_pass.cpp:1076)
            params = dict(params, tf=jnp.clip(params["tf"], 0.0, 1.0))
        if optimize_vol:
            params = dict(params, vol=jnp.maximum(params["vol"], 0.0))
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def init_state(optimizer, params: dict) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.int32(0))


def make_depth_train_step(mesh, settings: RenderSettings, optimizer,
                          *, optimize_vol: bool, optimize_tf: bool,
                          vol_shape, slab_axes: tuple,
                          slab_mode: str = "exact",
                          interpret: bool = False):
    """Training step with the GRID — and therefore its gradient and Adam
    moments — sharded over the mesh's ``"depth"`` axis.

    This is the growth path past one chip's HBM (SURVEY §7.2.5 "v2",
    BASELINE config 5): a 1024³ f32 grid + grad + 2 Adam moments is
    16 GiB, but over an 8-way depth mesh each chip holds 2 GiB.  The
    pixel-sharded step (:func:`make_train_step`) replicates all of it.

    Same contract as :func:`make_train_step` — ``(state, fixed, cameras,
    targets) -> (state, loss)`` with ``fixed["axis_codes"]`` selecting the
    per-view kernel — with one structural restriction: every posed view
    must march along ONE volume axis (the axis the grid is physically
    laid out over); opposing directions (reverse False/True) each get
    their own compiled kernel.  Distributing the march loop of
    ``res/shaders/volume.frag:29-50`` along the ray means the decomposed
    axis is baked into the data layout, unlike pixel sharding.

    ``state.params["vol"]`` must be placed with :func:`init_depth_state`
    (or any placement — the step constrains shardings itself, but a
    replicated init defeats the memory point).
    """
    from volumetric_renderer_tpu.parallel.depth import (
        depth_vol_spec, make_depth_sharded_renderer,
    )

    axes = {a for a, _ in slab_axes}
    if len(axes) != 1:
        raise ValueError(
            "depth-sharded training lays the grid out along ONE slab "
            f"axis; the views need {sorted(axes)} — restrict the camera "
            "ring to a single dominant axis (both reverse directions "
            "are fine)")
    render_fns = [
        make_depth_sharded_renderer(mesh, settings,
                                    vol_shape=tuple(vol_shape),
                                    slab_axis=a, slab_reverse=r,
                                    slab_mode=slab_mode,
                                    interpret=interpret, jit=False)
        for (a, r) in slab_axes
    ]
    vshard = NamedSharding(mesh, depth_vol_spec(next(iter(axes))))

    def shard_vol(x):
        return jax.lax.with_sharding_constraint(x, vshard)

    def loss_fn(params, fixed, cameras, targets):
        vol = params["vol"] if optimize_vol else fixed["vol"]
        tf = params["tf"] if optimize_tf else fixed["tf"]
        if optimize_vol:
            vol = shard_vol(vol)

        def one_view(i, carry):
            cam = jax.tree.map(lambda x: x[i], cameras)
            fargs = (vol, tf, cam, fixed["dmin"], fixed["dmax"],
                     fixed["smin"], fixed["smax"])
            if len(render_fns) == 1:
                img = render_fns[0](*fargs)
            else:
                img = jax.lax.switch(
                    fixed["axis_codes"][i],
                    [functools.partial(f, *fargs) for f in render_fns])
            return carry + jnp.mean((img - targets[i]) ** 2)

        total = jax.lax.fori_loop(0, targets.shape[0], one_view,
                                  jnp.float32(0.0))
        return total / targets.shape[0]

    @jax.jit
    def train_step(state: TrainState, fixed, cameras, targets):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, fixed, cameras, targets)
        if optimize_vol:
            # the grid cotangent comes out of the shard_map transpose
            # already depth-sharded; pin it so the optimizer update (and
            # the Adam moments it touches) never rematerializes a
            # replicated copy
            grads = dict(grads, vol=shard_vol(grads["vol"]))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        if optimize_tf:
            params = dict(params, tf=jnp.clip(params["tf"], 0.0, 1.0))
        if optimize_vol:
            params = dict(params,
                          vol=shard_vol(jnp.maximum(params["vol"], 0.0)))
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def init_depth_state(optimizer, params: dict, mesh,
                     slab_axis: int) -> TrainState:
    """``init_state`` with ``params["vol"]`` (hence the Adam moments
    ``zeros_like`` it) physically placed on the depth mesh."""
    from volumetric_renderer_tpu.parallel.depth import depth_vol_spec

    if "vol" in params:
        sh = NamedSharding(mesh, depth_vol_spec(slab_axis))
        params = dict(params, vol=jax.device_put(params["vol"], sh))
    return TrainState(params, optimizer.init(params), jnp.int32(0))
