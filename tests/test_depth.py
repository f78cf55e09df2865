"""Depth-sharded rendering (parallel/depth) — the halo-sharded grid path.

Validates the two layers separately:
  1. the chunk-aware kernel: rendering a volume as K depth chunks (each a
     body+halo slice with a global a_start) and folding the partials with
     the over-operator reproduces the whole-volume render AND its
     gradients (halo-row grads land on the neighbour's first row);
  2. the shard_map version on the 8-device virtual mesh: grid sharded
     over "depth", halo via ppermute, partials all_gathered — forward and
     grid/TF gradients match the unsharded fused reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volumetric_renderer_tpu.core.fused import make_fused_marcher
from volumetric_renderer_tpu.data.volume import Volume
from volumetric_renderer_tpu.kernels.slab import (
    _PERMS, choose_axis_from_camera, make_slab_marcher,
)
from volumetric_renderer_tpu.parallel.depth import (
    composite_chunks, make_depth_sharded_renderer, over,
)
from volumetric_renderer_tpu.parallel.mesh import make_mesh
from volumetric_renderer_tpu.scene.camera import OrbitCamera, ray_grid
from volumetric_renderer_tpu.transfer.gradient import Gradient
from volumetric_renderer_tpu.utils.config import RenderSettings

H = W = 24
SETTINGS = RenderSettings(height=H, width=W, step_size=0.05,
                          early_termination=False, tf_resolution=32)


def scene(n=16):
    vol = Volume.synthetic_sphere(n).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(32))
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 0.7, 32))
    cam = OrbitCamera.from_angles(yaw_deg=33.0, pitch_deg=21.0)
    args4 = (jnp.float32(0.0), jnp.float32(1.0), jnp.zeros(3), jnp.ones(3))
    return vol, tf, cam, args4


def reference(vol, tf, cam, args4):
    m = make_fused_marcher(SETTINGS.num_steps, SETTINGS.step_size,
                           False, SETTINGS.termination_eps)
    origin, dirs = ray_grid(cam, H, W)
    return m(vol, tf, origin + 0.5, dirs, *args4), (origin + 0.5, dirs)


def test_over_operator_associative():
    rng = np.random.default_rng(0)
    parts = []
    for _ in range(3):
        rgb = rng.random((4, 4, 3)).astype(np.float32)
        a = rng.random((4, 4, 1)).astype(np.float32)
        parts.append(jnp.asarray(np.concatenate([rgb, a], -1)))
    left = over(over(parts[0], parts[1]), parts[2])
    right = over(parts[0], over(parts[1], parts[2]))
    np.testing.assert_allclose(np.asarray(left), np.asarray(right),
                               atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("n_chunks", [2, 4])
def test_chunked_marcher_composes_to_full_render(n_chunks):
    """K chunk partials folded in march order == the whole-volume render;
    summed chunk grads (halo rows onto their owners) == full grads."""
    vol, tf, cam, args4 = scene()
    axis, reverse = choose_axis_from_camera(cam)
    want, (origin, dirs) = reference(vol, tf, cam, args4)

    perm = _PERMS[axis]
    vax = perm[0]
    na = vol.shape[vax]
    body = na // n_chunks
    marcher = make_slab_marcher(
        SETTINGS.num_steps, SETTINGS.step_size, False,
        SETTINGS.termination_eps,
        tuple(body + 1 if i == vax else d for i, d in enumerate(vol.shape)),
        32, H, W, axis=axis, reverse=reverse, interpret=True,
        a_body=body, na_total=na)

    def chunk_of(v, c):
        lo = c * body
        pad = jnp.zeros_like(jax.lax.slice_in_dim(v, 0, 1, axis=vax))
        vp = jnp.concatenate([v, pad], axis=vax)
        return jax.lax.slice_in_dim(vp, lo, lo + body + 1, axis=vax)

    def render_chunks(v, t):
        parts = [marcher(chunk_of(v, c), t, origin, dirs, *args4,
                         jnp.float32(c * body))
                 for c in range(n_chunks)]
        return composite_chunks(parts, reverse=reverse)

    got = render_chunks(vol, tf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)

    def loss_chunks(v, t):
        return jnp.sum(jnp.sin(3.0 * render_chunks(v, t)))

    def loss_full(v, t):
        img, _ = reference(v, t, cam, args4)
        return jnp.sum(jnp.sin(3.0 * img))

    gv_c, gt_c = jax.grad(loss_chunks, argnums=(0, 1))(vol, tf)
    gv_f, gt_f = jax.grad(loss_full, argnums=(0, 1))(vol, tf)
    for got_g, want_g in ((gv_c, gv_f), (gt_c, gt_f)):
        got_g, want_g = np.asarray(got_g), np.asarray(want_g)
        np.testing.assert_allclose(got_g, want_g, rtol=0,
                                   atol=2e-4 * np.abs(want_g).max())


@pytest.mark.slow
def test_depth_sharded_renderer_matches_unsharded():
    """Grid sharded over an 8-device depth mesh: forward + gradient parity
    (vol grads flow through the sharded chunks + ppermute halo; TF grads
    all-reduce over depth)."""
    mesh = make_mesh(jax.devices()[:8], shape=(8,), axis_names=("depth",))
    vol, tf, cam, args4 = scene()
    axis, reverse = choose_axis_from_camera(cam)
    want, _ = reference(vol, tf, cam, args4)

    render_fn = make_depth_sharded_renderer(
        mesh, SETTINGS, vol_shape=vol.shape, slab_axis=axis,
        slab_reverse=reverse, interpret=True)
    got = render_fn(vol, tf, cam, *args4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)

    def loss_sharded(v, t):
        return jnp.sum(jnp.sin(3.0 * render_fn(v, t, cam, *args4)))

    def loss_full(v, t):
        img, _ = reference(v, t, cam, args4)
        return jnp.sum(jnp.sin(3.0 * img))

    gv_s, gt_s = jax.grad(loss_sharded, argnums=(0, 1))(vol, tf)
    gv_f, gt_f = jax.grad(loss_full, argnums=(0, 1))(vol, tf)

    # Tolerance is scale-aware and wider than the pixel-sharded tests'
    # 2e-4: 8 thin chunks (2-row slabs) reassociate every f32
    # accumulation relative to the 16-row single render, and in-jit ray
    # generation differs from the eager reference by ~1 ulp (the known
    # effect documented in tests/test_parallel.py) — measured headroom is
    # ~2.3e-4 relative; routing bugs (double/missing halo adds) would be
    # O(1) of a voxel grad, far outside it.
    for got_g, want_g in ((gv_s, gv_f), (gt_s, gt_f)):
        got_g, want_g = np.asarray(got_g), np.asarray(want_g)
        np.testing.assert_allclose(got_g, want_g, rtol=0,
                                   atol=5e-4 * np.abs(want_g).max())


@pytest.mark.slow
def test_depth_sharded_train_step():
    """Grid inversion with the grid + Adam moments sharded over depth
    (the 1024^3 growth path, executable): params/moments stay physically
    depth-sharded across steps, gradients match an unsharded reference
    (checked through one SGD step), and the loss decreases."""
    import optax

    from volumetric_renderer_tpu.parallel.depth import depth_vol_spec
    from volumetric_renderer_tpu.parallel.train import (
        init_depth_state, make_depth_train_step, slab_axes_for_cameras,
    )

    mesh = make_mesh(jax.devices()[:8], shape=(8,), axis_names=("depth",))
    vol_gt, tf, _, args4 = scene()
    # two opposing views: same dominant axis, both march directions
    cams = [OrbitCamera.from_angles(yaw_deg=33.0, pitch_deg=21.0),
            OrbitCamera.from_angles(yaw_deg=213.0, pitch_deg=21.0)]
    codes, pairs = slab_axes_for_cameras(cams)
    assert len({a for a, _ in pairs}) == 1
    cameras = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    targets = jnp.stack([reference(vol_gt, tf, c, args4)[0] for c in cams])
    fixed = dict(vol=vol_gt, tf=tf, dmin=args4[0], dmax=args4[1],
                 smin=args4[2], smax=args4[3], axis_codes=codes)
    vol0 = jnp.full(vol_gt.shape, 0.3, jnp.float32)

    # 1. gradient parity through one SGD step: delta == -lr * grad
    lr = 1.0
    sgd = optax.sgd(lr)
    step_fn = make_depth_train_step(
        mesh, SETTINGS, sgd, optimize_vol=True, optimize_tf=False,
        vol_shape=vol_gt.shape, slab_axes=pairs, interpret=True)
    state = init_depth_state(sgd, {"vol": vol0}, mesh, pairs[0][0])
    state1, loss0 = step_fn(state, fixed, cameras, targets)
    got_g = (vol0 - state1.params["vol"]) / lr

    def ref_loss(v):
        views = [reference(v, tf, c, args4)[0] for c in cams]
        return sum(jnp.mean((img - t) ** 2)
                   for img, t in zip(views, targets)) / len(cams)

    want_g = jax.grad(ref_loss)(vol0)
    got_g, want_g = np.asarray(got_g), np.asarray(want_g)
    np.testing.assert_allclose(got_g, want_g, rtol=0,
                               atol=5e-4 * np.abs(want_g).max())

    # 2. Adam: loss decreases and everything stays depth-sharded
    adam = optax.adam(5e-2)
    step_fn = make_depth_train_step(
        mesh, SETTINGS, adam, optimize_vol=True, optimize_tf=False,
        vol_shape=vol_gt.shape, slab_axes=pairs, interpret=True)
    state = init_depth_state(adam, {"vol": vol0}, mesh, pairs[0][0])
    vspec = depth_vol_spec(pairs[0][0])
    assert state.params["vol"].sharding.spec == vspec
    mu = state.opt_state[0].mu["vol"]
    assert mu.sharding.spec == vspec, "Adam moments must shard with the grid"

    losses = []
    for _ in range(5):
        state, loss = step_fn(state, fixed, cameras, targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
    assert state.params["vol"].sharding.spec == vspec
    assert state.opt_state[0].mu["vol"].sharding.spec == vspec


def test_depth_train_step_rejects_mixed_axes():
    import optax

    from volumetric_renderer_tpu.parallel.train import make_depth_train_step

    mesh = make_mesh(jax.devices()[:8], shape=(8,), axis_names=("depth",))
    with pytest.raises(ValueError, match="ONE slab axis"):
        make_depth_train_step(
            mesh, SETTINGS, optax.adam(1e-2), optimize_vol=True,
            optimize_tf=False, vol_shape=(16, 16, 16),
            slab_axes=((0, False), (1, False)), interpret=True)


@pytest.mark.slow
def test_depth_sharded_hlo_collectives():
    """The depth forward's communication budget: the one halo ppermute +
    the partial-image all_gather — and nothing else; the backward adds
    the TF all-reduce but must NOT all-reduce the (sharded) grid grads."""
    mesh = make_mesh(jax.devices()[:8], shape=(8,), axis_names=("depth",))
    vol, tf, cam, args4 = scene()
    axis, reverse = choose_axis_from_camera(cam)
    render_fn = make_depth_sharded_renderer(
        mesh, SETTINGS, vol_shape=vol.shape, slab_axis=axis,
        slab_reverse=reverse, interpret=True)

    fwd = render_fn.lower(vol, tf, cam, *args4).compile().as_text()
    assert "collective-permute" in fwd          # the halo exchange
    assert "all-gather" in fwd                  # the partial combine
    assert "all-reduce" not in fwd

    def loss(v, t):
        return jnp.sum(render_fn(v, t, cam, *args4) ** 2)

    bwd = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(
        vol, tf).compile().as_text()
    assert "all-reduce" in bwd                  # TF/window grads
