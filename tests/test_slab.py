"""Slab Pallas kernel (kernels/slab.py) — golden tests vs the oracle.

CI runs the kernel in interpreter mode (CPU); the real-TPU compile +
parity + perf run is ``apps/benchmark.py`` / ``bench.py`` on hardware.
Math under test mirrors ``/root/reference/res/shaders/volume.frag:29-50``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from volumetric_renderer_tpu.core.marcher import march_rays
from volumetric_renderer_tpu.data.volume import Volume
from volumetric_renderer_tpu.kernels.slab import (
    _k_interval,
    build_slabs,
    choose_axis,
    choose_axis_from_camera,
    make_slab_marcher,
    make_slab_renderer,
)
from volumetric_renderer_tpu.render.api import render
from volumetric_renderer_tpu.scene.camera import OrbitCamera, ray_grid
from volumetric_renderer_tpu.transfer.gradient import Gradient
from volumetric_renderer_tpu.utils.config import RenderSettings

H, W, STEPS, N, NTF = 32, 32, 48, 32, 32
STEP = 1.8 / STEPS


@pytest.fixture(scope="module")
def scene():
    vol = Volume.synthetic_sphere(N).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(NTF))
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 1.0, NTF) ** 2)
    return vol, tf


def _march(vol, tf, cam, h=H, w=W, *, et=False, eps=1.0 / 255.0,
           smin=None, smax=None, mode="exact", steps=STEPS,
           step_batch=0):
    origin, dirs = ray_grid(cam, h, w)
    origin = origin + 0.5
    smin = jnp.zeros(3) if smin is None else jnp.asarray(smin, jnp.float32)
    smax = jnp.ones(3) if smax is None else jnp.asarray(smax, jnp.float32)
    dmin, dmax = jnp.float32(0.0), jnp.float32(1.0)
    step = 1.8 / steps

    ref = march_rays(vol, tf, origin, dirs, density_min=dmin,
                     density_max=dmax, slice_min=smin, slice_max=smax,
                     num_steps=steps, step_size=step,
                     early_termination=et, termination_eps=eps)

    axis, reverse = choose_axis_from_camera(cam)
    marcher = make_slab_marcher(steps, step, et, eps, tuple(vol.shape),
                                tf.shape[0], h, w, axis=axis,
                                reverse=reverse, mode=mode, interpret=True,
                                step_batch=step_batch)
    got = marcher(vol, tf, origin, dirs, dmin, dmax, smin, smax)
    return np.asarray(got), np.asarray(ref)


@pytest.mark.parametrize("yaw,pitch", [(30.0, 20.0), (120.0, -35.0),
                                       (200.0, 5.0), (0.0, 80.0)])
@pytest.mark.slow
def test_matches_oracle_all_orientations(scene, yaw, pitch):
    vol, tf = scene
    cam = OrbitCamera.from_angles(yaw_deg=yaw, pitch_deg=pitch)
    got, ref = _march(vol, tf, cam)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_matches_oracle_early_termination(scene):
    vol, tf = scene
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    got, ref = _march(vol, tf, cam, et=True)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("yaw,pitch,batch", [(30.0, 20.0, 4),
                                             (120.0, -35.0, 3),
                                             (200.0, 5.0, 8),
                                             (0.0, 80.0, 2)])
@pytest.mark.slow
def test_matches_oracle_step_batched(scene, yaw, pitch, batch):
    """Forward step batching (fused (B*P, K) matmuls in the hot loop):
    bit-exact parity with the oracle at every batch size across all slab
    orientations, including a batch that doesn't divide the step count."""
    vol, tf = scene
    cam = OrbitCamera.from_angles(yaw_deg=yaw, pitch_deg=pitch)
    got, ref = _march(vol, tf, cam, step_batch=batch)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_matches_oracle_step_batched_early_termination(scene):
    """BATCH>1 with the in-slab while_loop exit: masking semantics must
    keep the batched ET image identical to the oracle's per-ray break."""
    vol, tf = scene
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    got, ref = _march(vol, tf, cam, et=True, step_batch=4)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("bwd_batch,et", [(2, False), (4, True), (3, False)])
def test_backward_step_batched_matches_oracle(bwd_batch, et):
    """The Pallas backward's step batching: gradient parity vs the
    oracle's autodiff at BATCH>1 (incl. non-dividing batch and ET)."""
    import jax

    vol = Volume.synthetic_sphere(12).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(8))
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 1.0, 8) ** 2)
    cam = OrbitCamera.from_angles(yaw_deg=120.0, pitch_deg=-35.0)
    origin, dirs = ray_grid(cam, 16, 16)
    origin = origin + 0.5
    smin, smax = jnp.zeros(3), jnp.ones(3)

    axis, reverse = choose_axis_from_camera(cam)
    marcher = make_slab_marcher(20, 1.8 / 20, et, 1.0 / 255.0,
                                tuple(vol.shape), tf.shape[0], 16, 16,
                                axis=axis, reverse=reverse, interpret=True,
                                bwd="slab", bwd_mode="exact",
                                bwd_step_batch=bwd_batch)

    def loss_slab(v, t, dmn, dmx):
        return jnp.sum(marcher(v, t, origin, dirs, dmn, dmx, smin, smax)
                       ** 2)

    def loss_oracle(v, t, dmn, dmx):
        img = march_rays(v, t, origin, dirs, density_min=dmn,
                         density_max=dmx, slice_min=smin, slice_max=smax,
                         num_steps=20, step_size=1.8 / 20,
                         early_termination=et, termination_eps=1.0 / 255.0)
        return jnp.sum(img ** 2)

    g = jax.grad(loss_slab, argnums=(0, 1, 2, 3))(
        vol, tf, jnp.float32(0.0), jnp.float32(1.0))
    r = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(
        vol, tf, jnp.float32(0.0), jnp.float32(1.0))
    for got, ref in zip(g, r):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)


@pytest.mark.slow
def test_matches_oracle_slicing(scene):
    vol, tf = scene
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    got, ref = _march(vol, tf, cam, smin=(0.1, 0.2, 0.0),
                      smax=(0.9, 1.0, 0.7))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_matches_oracle_nondivisible_image(scene):
    """H, W not multiples of the 16x16 tile: padded rays must be inert."""
    vol, tf = scene
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    got, ref = _march(vol, tf, cam, h=30, w=20)
    assert got.shape == (30, 20, 4)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_fast_mode_close(scene):
    """DEFAULT-precision matmuls: error under half a display quantum."""
    vol, tf = scene
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    got, ref = _march(vol, tf, cam, mode="fast")
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_api_method_slab(scene):
    vol, tf = scene
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    s = RenderSettings(height=H, width=W, step_size=STEP,
                       early_termination=False)
    ref = np.asarray(render(vol, tf, cam, s, method="oracle"))
    got = np.asarray(render(vol, tf, cam, s, method="slab", interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_api_method_slab_under_jit(scene):
    """render(method='slab') must work INSIDE jax.jit with a closed-over
    concrete camera — the envelope check runs at compile time
    (regression: omnistaging made its ray grid a tracer)."""
    import jax

    vol, tf = scene
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    s = RenderSettings(height=H, width=W, step_size=STEP,
                       early_termination=False)
    fn = jax.jit(lambda v, t: render(v, t, cam, s, method="slab",
                                     interpret=True))
    ref = np.asarray(render(vol, tf, cam, s, method="oracle"))
    # in-jit ray generation reassociates f32 vs the eager reference
    # (~1 ulp on ray dirs, amplified at density edges) — same tolerance
    # class as tests/test_parallel.py
    np.testing.assert_allclose(np.asarray(fn(vol, tf)), ref, atol=2e-4)


@pytest.mark.parametrize("bwd,bwd_mode", [("fused", "exact"),
                                          ("slab", "exact"),
                                          ("slab", "high")])
@pytest.mark.slow
def test_gradients_match_oracle(scene, bwd, bwd_mode):
    """Both custom-VJP backwards — the XLA fused re-march delegate and the
    TPU-native Pallas slab backward — match the oracle's plain autodiff;
    bwd_mode='high' exercises the manual bf16x3 decomposition's wiring
    (numerically exact in interpret mode: the splits recombine in f32)."""
    import jax

    vol = Volume.synthetic_sphere(8).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(8))
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    origin, dirs = ray_grid(cam, 16, 16)
    origin = origin + 0.5
    args = (jnp.float32(0.0), jnp.float32(1.0), jnp.zeros(3), jnp.ones(3))

    axis, reverse = choose_axis_from_camera(cam)
    marcher = make_slab_marcher(16, 1.8 / 16, False, 1.0 / 255.0,
                                tuple(vol.shape), tf.shape[0], 16, 16,
                                axis=axis, reverse=reverse, interpret=True,
                                bwd=bwd, bwd_mode=bwd_mode)

    def loss_slab(v, t):
        return jnp.sum(marcher(v, t, origin, dirs, *args) ** 2)

    def loss_oracle(v, t):
        img = march_rays(v, t, origin, dirs, density_min=args[0],
                         density_max=args[1], slice_min=args[2],
                         slice_max=args[3], num_steps=16,
                         step_size=1.8 / 16, early_termination=False,
                         termination_eps=1.0 / 255.0)
        return jnp.sum(img ** 2)

    gv, gt = jax.grad(loss_slab, argnums=(0, 1))(vol, tf)
    gv_ref, gt_ref = jax.grad(loss_oracle, argnums=(0, 1))(vol, tf)
    # rtol covers f32 summation-order noise on large-magnitude TF grads
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref),
                               atol=1e-4, rtol=1e-5)


def test_make_levels_structure():
    """Window-level ladder: cheapest first, the last never misses, and
    the wide late-ray levels appear only at large faces (the 384-face
    production gate; hardware-measured 1.95x at 512^3, -3.8% at 256^3)."""
    from volumetric_renderer_tpu.kernels.slab import _make_levels

    lv512 = _make_levels(12, 512, 512)
    assert lv512[-1] == (12, 512, 512)
    assert (12, 96, 128) in lv512 and (12, 224, 512) in lv512

    lv256 = _make_levels(18, 256, 256)
    assert lv256[-1] == (18, 256, 256)
    assert all(yw <= 48 for (_, yw, _) in lv256[:-1])  # no wide levels

    for lv in (lv512, lv256, _make_levels(72, 128, 128)):
        zw, yw, cw = lv[-1]
        for (z, y, c) in lv:
            assert z <= zw and y <= yw and c <= cw


def test_gradient_parity_fast():
    """One cheap gradient-parity case kept in the fast suite so a
    `-m 'not slow'` run still guards the production custom VJP (the
    full orientation/mode matrix is in the slow tests above)."""
    import jax

    vol = Volume.synthetic_sphere(8).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(8))
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 1.0, 8) ** 2)
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    origin, dirs = ray_grid(cam, 16, 16)
    origin = origin + 0.5
    args = (jnp.float32(0.0), jnp.float32(1.0), jnp.zeros(3), jnp.ones(3))

    axis, reverse = choose_axis_from_camera(cam)
    marcher = make_slab_marcher(12, 1.8 / 12, False, 1.0 / 255.0,
                                tuple(vol.shape), tf.shape[0], 16, 16,
                                axis=axis, reverse=reverse, interpret=True,
                                bwd="slab", bwd_mode="exact",
                                bwd_step_batch=2)

    def loss_slab(v, t):
        return jnp.sum(marcher(v, t, origin, dirs, *args) ** 2)

    def loss_oracle(v, t):
        img = march_rays(v, t, origin, dirs, density_min=args[0],
                         density_max=args[1], slice_min=args[2],
                         slice_max=args[3], num_steps=12,
                         step_size=1.8 / 12, early_termination=False,
                         termination_eps=1.0 / 255.0)
        return jnp.sum(img ** 2)

    gv, gt = jax.grad(loss_slab, argnums=(0, 1))(vol, tf)
    gv_ref, gt_ref = jax.grad(loss_oracle, argnums=(0, 1))(vol, tf)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("yaw,pitch,et", [(120.0, -35.0, False),
                                          (30.0, 20.0, True)])
@pytest.mark.slow
def test_pallas_backward_orientations_and_et(yaw, pitch, et):
    """The Pallas backward across slab orientations, early termination on
    and off, including the density-window scalar grads."""
    import jax

    vol = Volume.synthetic_sphere(12).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(8))
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 1.0, 8) ** 2)
    cam = OrbitCamera.from_angles(yaw_deg=yaw, pitch_deg=pitch)
    origin, dirs = ray_grid(cam, 16, 16)
    origin = origin + 0.5
    smin, smax = jnp.zeros(3), jnp.ones(3)

    axis, reverse = choose_axis_from_camera(cam)
    # bwd_mode="exact" pins the backward ALGORITHM at full precision;
    # the default "high" (bf16x3) carries its own hardware-measured
    # error budget (5.8e-5, docs/PARITY.md) and is wired-tested in
    # test_gradients_match_oracle[slab-high]
    marcher = make_slab_marcher(20, 1.8 / 20, et, 1.0 / 255.0,
                                tuple(vol.shape), tf.shape[0], 16, 16,
                                axis=axis, reverse=reverse, interpret=True,
                                bwd="slab", bwd_mode="exact")

    def loss_slab(v, t, dmn, dmx):
        return jnp.sum(marcher(v, t, origin, dirs, dmn, dmx, smin, smax)
                       ** 2)

    def loss_oracle(v, t, dmn, dmx):
        img = march_rays(v, t, origin, dirs, density_min=dmn,
                         density_max=dmx, slice_min=smin, slice_max=smax,
                         num_steps=20, step_size=1.8 / 20,
                         early_termination=et, termination_eps=1.0 / 255.0)
        return jnp.sum(img ** 2)

    g = jax.grad(loss_slab, argnums=(0, 1, 2, 3))(
        vol, tf, jnp.float32(0.0), jnp.float32(1.0))
    r = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(
        vol, tf, jnp.float32(0.0), jnp.float32(1.0))
    for got, ref in zip(g, r):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)


@pytest.mark.slow
def test_matches_oracle_wide_lane_volume():
    """nc_dim > 128: exercises the 128-lane c-window level and its fits()
    fallback in interpreter mode (otherwise only covered on hardware).
    Thin (16, 32, 160) volume keeps the march cheap."""
    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.random((16, 32, 160)), jnp.float32)
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(NTF))
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 0.8, NTF))
    cam = OrbitCamera.from_angles(yaw_deg=25.0, pitch_deg=15.0)
    got, ref = _march(vol, tf, cam, h=16, w=32, steps=32)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_envelope_violations_rays():
    """Hand-built rays opposing the slab direction must be counted; the
    orbit camera can provably never produce any (wide FoV, close radius
    included) — both facts pinned here, plus correct wide-FoV output."""
    from volumetric_renderer_tpu.kernels.slab import (
        count_envelope_violations, count_envelope_violations_rays,
    )

    # adversarial ray-level input: origin past the cube along +z (slab
    # axis 0, forward), ray pointing back through the cube -> 1 violation
    origin = jnp.asarray([0.5, 0.5, 2.0])
    dirs = jnp.asarray([[[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]]])
    assert count_envelope_violations_rays(origin, dirs, 0, False) == 1
    assert count_envelope_violations_rays(origin, dirs, 0, True) == 0

    # orbit cameras: zero violations across radius x FoV, incl. inside
    # the cube (all rays miss via the t_entry >= 0 back-face-cull rule)
    for radius in (0.3, 0.7, 0.95, 1.2, 3.0):
        for fov in (40.0, 100.0, 150.0):
            cam = OrbitCamera.from_angles(yaw_deg=33.0, pitch_deg=21.0,
                                          radius=radius)
            axis, reverse = choose_axis_from_camera(cam)
            assert count_envelope_violations(
                cam, 24, 24, axis, reverse, fov_y_degrees=fov) == 0, (
                radius, fov)


@pytest.mark.slow
def test_wide_fov_close_camera_matches_oracle(scene):
    """Extreme camera (radius 1.0, 120 deg FoV): the slab kernel must
    produce the oracle's image, not silently drop pixels."""
    vol, tf = scene
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0, radius=1.0)
    origin, dirs = ray_grid(cam, 24, 24, 120.0, 0.1, 10.0)
    origin = origin + 0.5
    dmin, dmax = jnp.float32(0.0), jnp.float32(1.0)
    smin, smax = jnp.zeros(3), jnp.ones(3)
    ref = march_rays(vol, tf, origin, dirs, density_min=dmin,
                     density_max=dmax, slice_min=smin, slice_max=smax,
                     num_steps=STEPS, step_size=STEP,
                     early_termination=False, termination_eps=1 / 255.0)
    axis, reverse = choose_axis_from_camera(cam)
    marcher = make_slab_marcher(STEPS, STEP, False, 1 / 255.0,
                                tuple(vol.shape), tf.shape[0], 24, 24,
                                axis=axis, reverse=reverse, interpret=True)
    got = marcher(vol, tf, origin, dirs, dmin, dmax, smin, smax)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_resolve_method_auto():
    """auto -> fused on CPU and for traced cameras; (slab on TPU is
    covered by the hardware bench, not CI)."""
    import jax

    from volumetric_renderer_tpu.render.api import resolve_method

    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    if jax.default_backend() != "tpu":
        assert resolve_method(cam) == "fused"

    # auto must render without error whatever it resolves to
    vol = Volume.synthetic_sphere(16).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(8))
    s = RenderSettings(height=16, width=16, step_size=0.1)
    ref = np.asarray(render(vol, tf, cam, s, method="oracle"))
    got = np.asarray(render(vol, tf, cam, s, method="auto"))
    np.testing.assert_allclose(got, ref, atol=1e-5)


# -- unit tests of the kernel's building blocks ---------------------------

def test_build_slabs_reconstructs_volume(scene):
    vol, _ = scene
    for axis in (0, 1, 2):
        slabs = np.asarray(build_slabs(vol, axis))
        s_count, rows, b, c = slabs.shape
        thick = rows - 1
        from volumetric_renderer_tpu.kernels.slab import _PERMS
        vp = np.transpose(np.asarray(vol), _PERMS[axis])
        a_dim = vp.shape[0]
        # body rows tile the (padded) volume; halo row s equals body row 0
        # of slab s+1
        for s in range(s_count):
            lo = s * thick
            hi = min(lo + thick, a_dim)
            np.testing.assert_array_equal(slabs[s, : hi - lo], vp[lo:hi])
            if hi - lo < thick:  # zero padding past the edge
                assert not slabs[s, hi - lo:].any()
        for s in range(s_count - 1):
            np.testing.assert_array_equal(slabs[s, thick], slabs[s + 1, 0])


def test_k_interval_brute_force():
    """_k_interval must never exclude a step whose true interval overlaps."""
    rng = np.random.default_rng(0)
    for _ in range(200):
        a0 = rng.uniform(-4, 20, 2)
        a_lb0, a_ub0 = min(a0), max(a0)
        d = rng.uniform(-2, 2, 2)
        d_lb, d_ub = min(d), max(d)
        if rng.random() < 0.2:
            d_lb = d_ub = 0.0
        lo_p, hi_p = sorted(rng.uniform(-2, 18, 2))
        n = 12
        k_lo, k_hi = _k_interval(
            jnp.float32(a_lb0), jnp.float32(a_ub0), jnp.float32(d_lb),
            jnp.float32(d_ub), jnp.float32(lo_p), jnp.float32(hi_p), n)
        k_lo, k_hi = int(k_lo), int(k_hi)
        for k in range(n):
            lb = a_lb0 + k * d_lb
            ub = a_ub0 + k * d_ub
            overlaps = (ub >= lo_p) and (lb < hi_p)
            if overlaps:
                assert k_lo <= k < k_hi, (
                    f"missed k={k}: [{lb},{ub}] vs [{lo_p},{hi_p}) "
                    f"got [{k_lo},{k_hi})")


def test_choose_axis():
    assert choose_axis([0.0, 0.1, 1.0]) == (0, False)   # +z
    assert choose_axis([0.0, 0.0, -1.0]) == (0, True)   # -z
    assert choose_axis([0.1, -0.9, 0.2]) == (1, True)   # -y
    assert choose_axis([0.9, 0.1, 0.2]) == (2, False)   # +x


def test_choose_axis_from_camera_matches_rays():
    """The camera look direction must agree with the mean hit-ray dir."""
    for yaw, pitch in [(30.0, 20.0), (120.0, -35.0), (200.0, 5.0)]:
        cam = OrbitCamera.from_angles(yaw_deg=yaw, pitch_deg=pitch)
        _, dirs = ray_grid(cam, 16, 16)
        mean = np.asarray(dirs).reshape(-1, 3).mean(0)
        assert choose_axis_from_camera(cam) == choose_axis(mean)


def test_choose_axis_from_camera_rejects_tracer():
    import jax

    def f(q):
        cam = OrbitCamera(jnp.zeros(3), q, jnp.float32(3.0))
        choose_axis_from_camera(cam)
        return q

    with pytest.raises(TypeError, match="concrete camera"):
        jax.jit(f)(jnp.array([1.0, 0.0, 0.0, 0.0]))
