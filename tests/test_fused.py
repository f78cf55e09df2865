"""Fused custom-VJP marcher vs the oracle (plain autodiff through scan).

The fused path re-marches in the backward pass instead of storing
activations; its gradients must match ``jax.grad`` through
``core.marcher.march_rays`` to tight tolerance, and the voxel-grid
gradient must also match finite differences on a tiny scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volumetric_renderer_tpu.core.fused import make_fused_marcher
from volumetric_renderer_tpu.core.marcher import march_rays, render_oracle
from volumetric_renderer_tpu.data.volume import Volume
from volumetric_renderer_tpu.render.api import render
from volumetric_renderer_tpu.scene.camera import OrbitCamera, ray_grid
from volumetric_renderer_tpu.transfer.gradient import Gradient
from volumetric_renderer_tpu.utils.config import RenderSettings


def small_scene(n=12, h=12, w=16, tf_n=32):
    vol = Volume.synthetic_sphere(n).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(tf_n))
    # keep alpha well below 1 so the ALPHA_EPS clamp never bites and rays
    # stay unsaturated (exercises the full depth range)
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 0.6, tf_n))
    cam = OrbitCamera.from_angles(yaw_deg=33.0, pitch_deg=21.0)
    origin, dirs = ray_grid(cam, h, w)
    args = dict(
        density_min=jnp.float32(0.0), density_max=jnp.float32(1.0),
        slice_min=jnp.zeros(3), slice_max=jnp.ones(3),
    )
    return vol, tf, origin + 0.5, dirs, args


NUM_STEPS, STEP = 48, 0.035


def oracle_fn(vol, tf, origin, dirs, args, **kw):
    return march_rays(vol, tf, origin, dirs, num_steps=NUM_STEPS,
                      step_size=STEP, **args, **kw)


@pytest.mark.parametrize("early", [False, True])
def test_fused_forward_matches_oracle(early):
    vol, tf, origin, dirs, args = small_scene()
    want = oracle_fn(vol, tf, origin, dirs, args, early_termination=early)
    fused = make_fused_marcher(NUM_STEPS, STEP, early, 1.0 / 255.0)
    got = fused(vol, tf, origin, dirs, args["density_min"],
                args["density_max"], args["slice_min"], args["slice_max"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.slow
def test_fused_grads_match_autodiff():
    vol, tf, origin, dirs, args = small_scene()
    fused = make_fused_marcher(NUM_STEPS, STEP, False, 1.0 / 255.0)
    key = jax.random.PRNGKey(0)
    g_img = jax.random.normal(key, dirs.shape[:-1] + (4,), jnp.float32)

    def loss_oracle(vol, tf, dmin, dmax):
        img = march_rays(vol, tf, origin, dirs, num_steps=NUM_STEPS,
                         step_size=STEP, density_min=dmin, density_max=dmax,
                         slice_min=args["slice_min"],
                         slice_max=args["slice_max"])
        return jnp.sum(img * g_img)

    def loss_fused(vol, tf, dmin, dmax):
        img = fused(vol, tf, origin, dirs, dmin, dmax,
                    args["slice_min"], args["slice_max"])
        return jnp.sum(img * g_img)

    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(
        vol, tf, args["density_min"], args["density_max"])
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
        vol, tf, args["density_min"], args["density_max"])

    for name, a, b in zip(("vol", "tf", "dmin", "dmax"), go, gf):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=1e-3,
                                   err_msg=f"grad mismatch: {name}")


@pytest.mark.slow
def test_fused_grad_finite_difference():
    vol, tf, origin, dirs, args = small_scene(n=6, h=6, w=8, tf_n=16)
    fused = make_fused_marcher(24, 0.07, False, 1.0 / 255.0)

    def loss(v):
        img = fused(v, tf, origin, dirs, args["density_min"],
                    args["density_max"], args["slice_min"],
                    args["slice_max"])
        return jnp.sum(img**2)

    g = np.asarray(jax.grad(loss)(vol))
    # probe the few largest-gradient voxels with central differences (f64
    # recompute via the f32 function: eps tuned for ~1e-3 accuracy)
    flat = np.argsort(np.abs(g).ravel())[-5:]
    eps = 1e-3
    for idx in flat:
        z, y, x = np.unravel_index(idx, g.shape)
        vp = vol.at[z, y, x].add(eps)
        vm = vol.at[z, y, x].add(-eps)
        fd = (float(loss(vp)) - float(loss(vm))) / (2 * eps)
        assert abs(fd - g[z, y, x]) < 2e-2 * max(abs(fd), 1.0), (
            f"voxel ({z},{y},{x}): fd={fd} grad={g[z, y, x]}")


@pytest.mark.slow
def test_render_api_fused_matches_oracle_with_grad():
    """BASELINE criterion: pixel-gradient max-err < 1e-4 between methods."""
    vol = Volume.synthetic_sphere(10).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(32))
    cam = OrbitCamera.from_angles(yaw_deg=10, pitch_deg=-15)
    s = RenderSettings(height=12, width=12, step_size=0.05)

    def lo(v):
        return jnp.sum(render(v, tf, cam, s, method="oracle") ** 2)

    def lf(v):
        return jnp.sum(render(v, tf, cam, s, method="fused") ** 2)

    img_o = np.asarray(render(vol, tf, cam, s, method="oracle"))
    img_f = np.asarray(render(vol, tf, cam, s, method="fused"))
    np.testing.assert_allclose(img_f, img_o, atol=1e-6)
    g_o = np.asarray(jax.grad(lo)(vol))
    g_f = np.asarray(jax.grad(lf)(vol))
    assert np.abs(g_f - g_o).max() < 1e-4 * max(np.abs(g_o).max(), 1.0)


def test_axis_parallel_miss_ray_grads_finite():
    """An axis-parallel ray that misses the cube produces t_entry = +/-inf
    in the slab test; its inf*0 = NaN entry point must not poison voxel
    gradients (0 * NaN leaks through activity masks because int32(NaN)
    can cast in-bounds).  Regression for the cyclic-layout pad rays."""
    import jax

    from volumetric_renderer_tpu.data.volume import Volume

    vol = Volume.synthetic_sphere(8).as_jax()
    tf = jnp.asarray(np.linspace(0, 1, 32 * 4, dtype=np.float32)
                     .reshape(32, 4))
    origin = jnp.asarray([0.5, -2.32, 1.53])   # above the cube
    dirs = jnp.asarray([[[0.0, 0.0, 1.0]]])    # straight up: a miss
    args4 = (jnp.float32(0.0), jnp.float32(1.0), jnp.zeros(3), jnp.ones(3))
    m = make_fused_marcher(12, 1.8 / 12, False, 1 / 255.0)
    out = m(vol, tf, origin, dirs, *args4)
    np.testing.assert_array_equal(np.asarray(out).ravel(), 0.0)
    gv, gt = jax.grad(
        lambda v, t: jnp.sum(m(v, t, origin, dirs, *args4) ** 2),
        argnums=(0, 1))(vol, tf)
    assert bool(jnp.isfinite(gv).all()) and bool(jnp.isfinite(gt).all())
