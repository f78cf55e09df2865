"""Hardware gradient-parity check for backward precision recipes.

Compares grid/TF gradients of the production Pallas backward under the
current VRT_BWD_*_PREC env knobs (and bwd_mode) against the bwd_mode
="exact" backward on the same chip — the BASELINE "< 1e-4" gate for any
cheaper backward recipe before it can become a default.

    VRT_BWD_DENSITY_PREC=x3 python scripts/check_bwd_prec_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_compcache")

import jax
import jax.numpy as jnp

from volumetric_renderer_tpu.data.volume import Volume
from volumetric_renderer_tpu.kernels.slab import (
    choose_axis_from_camera, make_slab_marcher,
)
from volumetric_renderer_tpu.scene.camera import OrbitCamera, ray_grid
from volumetric_renderer_tpu.transfer.gradient import Gradient


def main():
    n, hw, steps, ntf = 64, 128, 128, 256
    vol = Volume.synthetic_sphere(n).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(ntf))
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 1.0, ntf) ** 2)
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    axis, reverse = choose_axis_from_camera(cam)
    origin, dirs = ray_grid(cam, hw, hw)
    origin = origin + 0.5
    scal = (jnp.float32(0.0), jnp.float32(1.0), jnp.zeros(3), jnp.ones(3))

    def grads(bwd_mode, clear_env=False):
        env_keys = [k for k in os.environ if k.startswith("VRT_BWD_")
                    and k.endswith("_PREC")]
        saved = {}
        if clear_env:
            for k in env_keys:
                saved[k] = os.environ.pop(k)
        try:
            m = make_slab_marcher(steps, 1.8 / steps, True, 1 / 255,
                                  tuple(vol.shape), ntf, hw, hw, axis=axis,
                                  reverse=reverse, mode="fast", bwd="slab",
                                  bwd_mode=bwd_mode)
            g = jax.jit(jax.grad(
                lambda v, t: jnp.mean(m(v, t, origin, dirs, *scal) ** 2),
                argnums=(0, 1)))
            return jax.block_until_ready(g(vol, tf))
        finally:
            os.environ.update(saved)

    gv_ref, gt_ref = grads("exact", clear_env=True)
    knobs = {k: v for k, v in os.environ.items()
             if k.startswith("VRT_BWD_") and k.endswith("_PREC")}
    mode = os.environ.get("VRT_BWD_MODE", "high")
    gv, gt = grads(mode)
    ev = float(jnp.abs(gv - gv_ref).max() / jnp.abs(gv_ref).max())
    et = float(jnp.abs(gt - gt_ref).max() / jnp.abs(gt_ref).max())
    # distribution of the error, for modes past the 1e-4 max-norm gate:
    # SGD cares about the bulk, a max-norm outlier at one voxel does not
    # characterize training behavior
    dv = jnp.abs(gv - gv_ref).ravel()
    scale = jnp.abs(gv_ref).max()
    mean_rel = float(dv.mean() / (jnp.abs(gv_ref).mean() + 1e-30))
    p999 = float(jnp.quantile(dv, 0.999) / scale)
    cos = float((gv.ravel() @ gv_ref.ravel())
                / (jnp.linalg.norm(gv) * jnp.linalg.norm(gv_ref) + 1e-30))
    print(f"knobs={knobs or '(none)'} mode={mode}: "
          f"vol grad rel err {ev:.2e} (mean {mean_rel:.2e}, "
          f"p99.9 {p999:.2e}, cosine {cos:.6f}), "
          f"tf grad rel err {et:.2e}")
    ok = ev < 1e-4 and et < 1e-4
    print("PARITY-OK" if ok else "PARITY-FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
