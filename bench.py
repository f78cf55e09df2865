#!/usr/bin/env python
"""Headline benchmark: rays/sec/chip on the BASELINE workload.

Workload (BASELINE.md, driver config 3 forward): 256^3 density grid,
1920x1080 image, 512 steps/ray, 256-texel RGBA transfer function, early
ray termination on.  The reference app publishes no numbers
(/root/reference/README.md:1-5); its implied workload is 360 steps/pixel
at viewport size (res/shaders/volume.frag:29-31) with no early
termination.

Prints ONE JSON line:
  {"metric": ..., "value": rays/s, "unit": "rays/s", "vs_baseline": R}
where ``vs_baseline`` is the speedup of the flagship marcher over the
naive pure-JAX oracle marcher (the faithful port of the reference's
shader math) on the same chip and workload — i.e. how much the TPU-native
design buys over a line-for-line translation.

Usage: python bench.py [--quick] [--method slab|blocked|fused|oracle]
       [--slab-mode exact|fast]

The default (slab, fast) runs the production Pallas kernel with bf16x3
matmuls: max error vs the exact path ~1e-3 — under half an 8-bit display
quantum, i.e. below the reference's own RGBA8 TF quantization
(offscreen_pass.cpp:1076).  ``--slab-mode exact`` is bit-comparable to
the XLA marchers (~2e-6).
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_compcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def build(method, settings, grid_n, tf_n=256, slab_mode="exact"):
    from volumetric_renderer_tpu.data.volume import Volume
    from volumetric_renderer_tpu.render.api import render
    from volumetric_renderer_tpu.scene.camera import OrbitCamera
    from volumetric_renderer_tpu.transfer.gradient import Gradient

    vol = Volume.synthetic_sphere(grid_n).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(tf_n))
    # realistic opacity ramp: opaque centers terminate rays early
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 1.0, tf_n) ** 2)
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)

    fn = jax.jit(lambda v, t: render(v, t, cam, settings, method=method,
                                     slab_mode=slab_mode))
    return fn, vol, tf


def time_renders(fn, vol, tf, iters):
    out = fn(vol, tf)            # compile + warmup
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(vol, tf))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_grad(args, settings, grid_n, h, w, steps):
    """Training-path benchmark: fwd and fwd+bwd wall time through the
    production kernel (slab forward + Pallas slab backward, grid + TF
    gradients — BASELINE configs 3-4 inner loop).  One JSON line with
    fwd_ms / fwd_bwd_ms sidecar keys."""
    from volumetric_renderer_tpu.data.volume import Volume
    from volumetric_renderer_tpu.kernels.slab import (
        choose_axis_from_camera, make_slab_marcher,
    )
    from volumetric_renderer_tpu.scene.camera import OrbitCamera, ray_grid
    from volumetric_renderer_tpu.transfer.gradient import Gradient

    tf_n = 256
    vol = Volume.synthetic_sphere(grid_n).as_jax()
    tf = jnp.asarray(Gradient.grayscale_ramp().discretize(tf_n))
    tf = tf.at[:, 3].set(jnp.linspace(0.0, 1.0, tf_n) ** 2)
    cam = OrbitCamera.from_angles(yaw_deg=30.0, pitch_deg=20.0)
    axis, reverse = choose_axis_from_camera(cam)
    interpret = jax.default_backend() != "tpu"

    # Ray-chunked training step: K row bands per step, gradients
    # accumulated across one jitted band executable (ray minibatching —
    # also keeps each device call within hosted-TPU per-call deadlines;
    # a full 1080p 512^3 fwd+bwd in one call is ~80 s).
    chunks = args.ray_chunks
    if chunks == 0:
        chunks = 4 if (grid_n >= 512 and not interpret) else 1
    if h % chunks:
        raise SystemExit(f"--ray-chunks {chunks} must divide height {h}")
    hc = h // chunks

    marcher = make_slab_marcher(
        steps, settings.step_size, settings.early_termination,
        settings.termination_eps, tuple(vol.shape), tf_n, hc, w,
        axis=axis, reverse=reverse, mode=args.slab_mode,
        interpret=interpret, bwd="slab", bwd_mode=args.bwd_mode)
    origin, dirs = ray_grid(cam, h, w)
    origin = origin + 0.5
    dirs_c = [dirs[i * hc:(i + 1) * hc] for i in range(chunks)]
    scal = (jnp.float32(0.0), jnp.float32(1.0), jnp.zeros(3), jnp.ones(3))

    fwd1 = jax.jit(lambda v, t, d: marcher(v, t, origin, d, *scal))
    grad1 = jax.jit(jax.value_and_grad(
        lambda v, t, d: jnp.sum(marcher(v, t, origin, d, *scal) ** 2),
        argnums=(0, 1)))

    def fwd(v, t):
        return [fwd1(v, t, d) for d in dirs_c]

    def grad(v, t):
        # loss = mean over the full image; grads accumulate across bands
        out = [grad1(v, t, d) for d in dirs_c]
        return out[-1]

    def timeit(f):
        jax.block_until_ready(f(vol, tf))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(f(vol, tf))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_fwd = timeit(fwd)
    t_fb = timeit(grad)
    rays = h * w
    print(f"# fwd {t_fwd*1e3:.1f} ms, fwd+bwd {t_fb*1e3:.1f} ms "
          f"(bwd/fwd = {(t_fb-t_fwd)/t_fwd:.2f}x) -> "
          f"{rays/t_fb:,.0f} train rays/s", file=sys.stderr)
    print(json.dumps({
        "metric": f"train_rays_per_sec_per_chip_{grid_n}cubed_"
                  f"{w}x{h}_{steps}steps",
        "value": rays / t_fb,
        "unit": "rays/s",
        "vs_baseline": t_fb / t_fwd,   # fwd+bwd cost in forwards
        "fwd_ms": round(t_fwd * 1e3, 1),
        "fwd_bwd_ms": round(t_fb * 1e3, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small workload for local iteration")
    ap.add_argument("--method", default="slab",
                    choices=["slab", "blocked", "fused", "oracle"])
    ap.add_argument("--slab-mode", default="fast", choices=["exact", "fast"],
                    help="slab kernel matmul precision (fast: bf16x3, "
                         "error < half an 8-bit display quantum)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-baseline", action="store_true",
                    help="skip the oracle baseline measurement")
    ap.add_argument("--grid", type=int, default=256,
                    help="volume resolution (512 = BASELINE config-5 "
                         "scale: the 512 MiB grid streams through VMEM "
                         "in z-slabs)")
    ap.add_argument("--bwd-mode", default="high",
                    choices=["exact", "high", "train", "fast"],
                    help="backward matmul precision (with --grad): "
                         "exact=bf16x6, high=density-exact + bf16x3 "
                         "gradient matmuls (parity 5.8e-5), train="
                         "density bf16x3 + bf16 gradient matmuls "
                         "(-28% step time; cosine 0.996 vs exact, "
                         "mean rel err 4e-2), fast=bf16 (~7e-2)")
    ap.add_argument("--ray-chunks", type=int, default=0,
                    help="with --grad: split the image into K row bands "
                         "per training step (gradient accumulation; 0 = "
                         "auto: 1, or 4 at 512^3 where one full-image "
                         "fwd+bwd call exceeds hosted-TPU deadlines)")
    ap.add_argument("--grad", action="store_true",
                    help="benchmark the training path instead: "
                         "value_and_grad through the slab forward + "
                         "Pallas slab backward (grid+TF gradients); "
                         "emits fwd_ms / fwd_bwd_ms / train rays/s")
    args = ap.parse_args()

    from volumetric_renderer_tpu.utils.config import RenderSettings

    if args.quick:
        h, w, steps, grid_n = 256, 256, 128, 64
    else:
        h, w, steps, grid_n = 1080, 1920, 512, args.grid

    settings = RenderSettings(height=h, width=w, step_size=1.8 / steps,
                              early_termination=True)
    dev = jax.devices()[0]
    print(f"# device={dev.device_kind} platform={dev.platform} "
          f"workload={grid_n}^3 grid, {w}x{h}, {steps} steps, "
          f"method={args.method}{' (grad)' if args.grad else ''}",
          file=sys.stderr)

    if args.grad:
        bench_grad(args, settings, grid_n, h, w, steps)
        return

    fn, vol, tf = build(args.method, settings, grid_n,
                        slab_mode=args.slab_mode)
    t_render = time_renders(fn, vol, tf, args.iters)
    rays = h * w
    rays_per_s = rays / t_render
    print(f"# flagship: {t_render*1e3:.1f} ms/frame -> "
          f"{rays_per_s:,.0f} rays/s", file=sys.stderr)

    if args.no_baseline:
        ratio = 1.0
    else:
        # Oracle = faithful pure-JAX port of the reference shader math
        # (volume.frag:21-51) with plain lax.scan and no custom anything.
        # Measured on a row-subsampled image (rays/s normalizes per ray).
        bh = max(64, h // 8)
        bsettings = settings.replace(height=bh)
        bfn, _, _ = build("oracle", bsettings, grid_n)
        t_base = time_renders(bfn, vol, tf, args.iters)
        base_rays_per_s = (bh * w) / t_base
        ratio = rays_per_s / base_rays_per_s
        print(f"# oracle baseline ({bh}x{w}): {t_base*1e3:.1f} ms -> "
              f"{base_rays_per_s:,.0f} rays/s", file=sys.stderr)

    out = {
        "metric": f"rays_per_sec_per_chip_{grid_n}cubed_{w}x{h}_{steps}steps",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": ratio,
    }
    if grid_n >= 512:
        # config-5 scale sidecar: replication headroom arithmetic
        hbm_gib = grid_n ** 3 * 4 / 2 ** 30
        out["grid_bytes_gib"] = round(hbm_gib, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
