"""Hardware parity check for MULTI-SLAB configurations.

The slab kernel carries per-tile compositing state across slabs through
``input_output_aliases`` on revisited blocks.  Pallas INTERPRET mode does
not honor that aliasing for revisited blocks (each slab reads the
original state — every interpret-mode multi-slab render is wrong), so
the interpret test suite can only cover single-slab configs (grids small
enough that one slab holds the whole volume: every <=96^3 default
config).  This script is the multi-slab correctness gate and must run on
real TPU hardware:

    python scripts/check_multislab_parity.py

It forces thin slabs with VRT_MAX_THICK so 64^3 / 128^3 grids decompose
into 4-8 slabs, covering the cross-slab state carry, the wide (rows, 96+,
cw) late-ray window levels (only built at faces >= 128), and both march
orientations, against the pure-JAX oracle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["VRT_MAX_THICK"] = os.environ.get("VRT_MAX_THICK", "16")
# build the wide late-ray window levels at the 128-face cases below
# (production gates them to faces >= 384)
os.environ.setdefault("VRT_WIDE_LEVELS_MIN_NB", "128")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_compcache")

import jax
import jax.numpy as jnp
import numpy as np

import volumetric_renderer_tpu.kernels.slab as S
from volumetric_renderer_tpu.core.marcher import march_rays
from volumetric_renderer_tpu.data.volume import Volume
from volumetric_renderer_tpu.scene.camera import OrbitCamera, ray_grid
from volumetric_renderer_tpu.transfer.gradient import Gradient


def check(n, hw, steps, yaw, pitch, mode, tol):
    vol = Volume.synthetic_sphere(n).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(64))
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 1.0, 64) ** 2)
    cam = OrbitCamera.from_angles(yaw_deg=yaw, pitch_deg=pitch)
    axis, rev = S.choose_axis_from_camera(cam)
    origin, dirs = ray_grid(cam, hw, hw)
    origin = origin + 0.5
    scal = (jnp.float32(0.0), jnp.float32(1.0), jnp.zeros(3), jnp.ones(3))
    m = S.make_slab_marcher(steps, 1.8 / steps, False, 1 / 255,
                            tuple(vol.shape), 64, hw, hw, axis=axis,
                            reverse=rev, mode=mode, interpret=False)
    got = np.asarray(jax.jit(lambda v, t: m(v, t, origin, dirs, *scal))(
        vol, tf))
    ref = np.asarray(march_rays(
        vol, tf, origin, dirs, density_min=0.0, density_max=1.0,
        slice_min=jnp.zeros(3), slice_max=jnp.ones(3), num_steps=steps,
        step_size=1.8 / steps, early_termination=False,
        termination_eps=1 / 255))
    err = float(np.abs(got - ref).max())
    thick = S._choose_thick(n, n, n)
    n_slab = -(-n // thick)
    print(f"{n}^3/{hw}px/{steps}st yaw={yaw} mode={mode}: "
          f"n_slab={n_slab} maxerr={err:.2e}")
    assert err < tol, (n, yaw, err)
    return err


def main():
    check(64, 128, 128, 35.0, 25.0, "exact", 1e-4)
    check(64, 128, 128, 120.0, -35.0, "exact", 1e-4)
    # 128-face: exercises the (rows, 96/224, cw) late-ray window levels
    check(128, 128, 192, 35.0, 25.0, "exact", 1e-4)
    check(128, 128, 192, 35.0, 25.0, "fast", 5e-3)
    print("MULTISLAB-PARITY-OK")


if __name__ == "__main__":
    main()
