"""Hardware parity check: bwd step_batch in {2, 4} vs the step-serial
backward, on the real chip (the interpret-mode tests cover semantics;
this covers the Mosaic lowering).  Small config-1-like scene."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_compcache")

import jax
import jax.numpy as jnp
import numpy as np

from volumetric_renderer_tpu.data.volume import Volume
from volumetric_renderer_tpu.kernels.slab import (
    choose_axis_from_camera, make_slab_marcher,
)
from volumetric_renderer_tpu.scene.camera import OrbitCamera, ray_grid
from volumetric_renderer_tpu.transfer.gradient import Gradient


def main():
    n, hw, steps, ntf = 64, 64, 64, 256
    vol = Volume.synthetic_sphere(n).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(ntf))
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 1.0, ntf) ** 2)
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    axis, reverse = choose_axis_from_camera(cam)
    origin, dirs = ray_grid(cam, hw, hw)
    origin = origin + 0.5
    scal = (jnp.float32(0.0), jnp.float32(1.0), jnp.zeros(3), jnp.ones(3))

    def grads(bb):
        m = make_slab_marcher(steps, 1.8 / steps, True, 1 / 255,
                              tuple(vol.shape), ntf, hw, hw, axis=axis,
                              reverse=reverse, mode="fast", bwd="slab",
                              bwd_mode="high", step_batch=2,
                              bwd_step_batch=bb)
        g = jax.jit(jax.grad(
            lambda v, t: jnp.mean(m(v, t, origin, dirs, *scal) ** 2),
            argnums=(0, 1)))
        return jax.block_until_ready(g(vol, tf))

    gv1, gt1 = grads(1)
    for bb in (2, 4):
        gv, gt = grads(bb)
        ev = float(jnp.abs(gv - gv1).max() / jnp.abs(gv1).max())
        et = float(jnp.abs(gt - gt1).max() / jnp.abs(gt1).max())
        print(f"bwd_batch={bb}: vol grad rel err {ev:.2e}, "
              f"tf grad rel err {et:.2e}")
        assert ev < 1e-5 and et < 1e-5, (bb, ev, et)
    print("BWD-BATCH-PARITY-OK")


if __name__ == "__main__":
    main()
