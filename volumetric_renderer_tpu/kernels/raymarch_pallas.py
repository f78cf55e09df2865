"""Fused TPU ray-march kernel (Pallas / Mosaic).

TPU-native re-design of the reference fragment shader
(``res/shaders/volume.frag:21-51``): instead of one GPU thread per pixel
with hardware ``sampler3D`` fetches, each Pallas program marches a tile of
``8 x 128`` rays (sublanes x lanes) against a VMEM-resident volume.

Why this beats the XLA ``lax.scan`` marcher on TPU:

* **Adaptive trip count.** ``lax.scan`` runs every ray through all
  ``num_steps`` masked iterations — rays that miss the cube (>50% of a
  1080p frame), enter late, exit early, or saturate still pay full price.
  Here each tile computes its ray-box entry/exit span up front and runs a
  ``while_loop`` for only the steps any of its rays can be inside, with an
  additional all-lanes-terminated transmittance exit.
* **Gather without gather hardware.** TPUs have no per-lane arbitrary
  vector gather across lanes.  The volume is laid out ``(Z*Y, Xp)`` with X
  padded onto the 128-lane axis; the 4 ``(z, y)`` corner rows per ray are
  fetched with ``jnp.take`` along the *sublane* axis (a supported Mosaic
  dynamic-gather form), and the x-axis lerp is a lane-mask weighted
  *reduction* (``iota``-built one-hot weights) rather than a second
  gather.  The transfer-function fetch uses a lane-replicated ``(4N, 128)``
  table with a per-lane sublane gather.
* **Everything stays in VMEM.** No per-step HBM round trips for ray state.

Numerics match ``core.fused.make_fused_marcher`` exactly (same entry-point
clamp, CLAMP_TO_BORDER corner masking, TF CLAMP_TO_EDGE, ALPHA_EPS opacity
clamp), so the kernel slots in as the forward of the same ``custom_vjp``.

Limits: requires ``Z * Y * Xp * 4`` bytes of VMEM for the volume
(<= ~12 MB, i.e. up to 128^3 f32 with X padded to 128).  Larger grids fall
back to the XLA fused path until the HBM brick-streaming variant lands.

**Status on current jaxlib**: Mosaic's gather lowering accepts only the
same-shape ``tpu.dynamic_gather`` forms (input, indices and output must
share one 2D shape — ``jax/_src/pallas/mosaic/lowering.py``,
``_gather_lowering_rule``), which cannot express a small-tile fetch from
a large VMEM-resident volume; per-lane cross-lane access does not exist
in the VPU.  Until that lands upstream, this kernel runs in interpreter
mode (exercised by the test suite for semantics) and the production TPU
renderer is ``core.blocked`` — whose adaptive-trip-count design this
kernel shares.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volumetric_renderer_tpu.core.fused import ALPHA_EPS, make_fused_marcher

TILE_H = 8     # rays per tile, sublane axis
TILE_W = 128   # rays per tile, lane axis
LANES = 128

# volume bytes that may sit in VMEM alongside the working set
VMEM_VOLUME_LIMIT = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_supported(vol_shape, dtype_bytes: int = 4) -> bool:
    z, y, x = vol_shape
    return z * y * _round_up(x, LANES) * dtype_bytes <= VMEM_VOLUME_LIMIT


def _march_kernel(params_ref, dx_ref, dy_ref, dz_ref, vol2_ref, tf_ref,
                  r_ref, g_ref, b_ref, a_ref, *,
                  zdim, ydim, xdim, xpad, tf_n, num_steps, step_size,
                  early_termination, termination_eps, height, width):
    """One program = one (TILE_H, TILE_W) ray tile, full depth march."""
    f32 = jnp.float32
    ox = params_ref[0, 0]
    oy = params_ref[0, 1]
    oz = params_ref[0, 2]
    dmin = params_ref[0, 3]
    inv_window = params_ref[0, 4]
    sx0 = params_ref[0, 5]
    sy0 = params_ref[0, 6]
    sz0 = params_ref[0, 7]
    sx1 = params_ref[0, 8]
    sy1 = params_ref[0, 9]
    sz1 = params_ref[0, 10]

    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]

    # ---- ray-box slab test (core.sampling.ray_box_intersect) ----
    def slab(o, d):
        inv = 1.0 / d
        t0 = (0.0 - o) * inv
        t1 = (1.0 - o) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    nx, fx = slab(ox, dx)
    ny, fy = slab(oy, dy)
    nz, fz = slab(oz, dz)
    t_entry = jnp.maximum(nx, jnp.maximum(ny, nz))
    t_exit = jnp.minimum(fx, jnp.minimum(fy, fz))
    hit = (t_entry <= t_exit) & (t_entry >= 0.0)

    # mask off image-padding rays (grid covers padded H/W)
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    rows = ti * TILE_H + jax.lax.broadcasted_iota(jnp.int32,
                                                  (TILE_H, TILE_W), 0)
    cols = tj * TILE_W + jax.lax.broadcasted_iota(jnp.int32,
                                                  (TILE_H, TILE_W), 1)
    hit = hit & (rows < height) & (cols < width)

    # entry point, clamped strictly inside (same epsilon as core.marcher)
    px0 = jnp.clip(ox + t_entry * dx, 1e-6, 1.0 - 1e-6)
    py0 = jnp.clip(oy + t_entry * dy, 1e-6, 1.0 - 1e-6)
    pz0 = jnp.clip(oz + t_entry * dz, 1e-6, 1.0 - 1e-6)

    # per-tile trip count: the largest step at which any ray can still be
    # inside the cube (conservative +2; the inside-mask is exact)
    span = jnp.where(hit, t_exit - t_entry, 0.0)
    k_hi = jnp.max(jnp.where(hit, span, 0.0)) / step_size
    tile_steps = jnp.minimum(
        jnp.int32(num_steps), k_hi.astype(jnp.int32) + 2)
    k_exit = jnp.where(hit, span / step_size + 2.0, 0.0)

    lane_x = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W, xpad), 2)
    amax = 1.0 - ALPHA_EPS

    def body(carry):
        k, r, g, b, tr = carry
        kf = k.astype(f32) * step_size
        px = px0 + kf * dx
        py = py0 + kf * dy
        pz = pz0 + kf * dz
        inside = ((px >= 0.0) & (px <= 1.0) & (py >= 0.0) & (py <= 1.0)
                  & (pz >= 0.0) & (pz <= 1.0))
        sliced = ((px > sx0) & (px < sx1) & (py > sy0) & (py < sy1)
                  & (pz > sz0) & (pz < sz1))
        active = inside & sliced & hit
        if early_termination:
            active = active & (tr > termination_eps)

        # ---- trilinear sample: 4 sublane row-gathers + x-lane reduction
        fxp = px * xdim - 0.5
        fyp = py * ydim - 0.5
        fzp = pz * zdim - 0.5
        x0f = jnp.floor(fxp)
        y0f = jnp.floor(fyp)
        z0f = jnp.floor(fzp)
        wx = fxp - x0f
        wy = fyp - y0f
        wz = fzp - z0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        z0 = z0f.astype(jnp.int32)
        x1 = x0 + 1
        y1 = y0 + 1
        z1 = z0 + 1

        # CLAMP_TO_BORDER: out-of-range corners contribute zero weight
        vx0 = (x0 >= 0) & (x0 < xdim)
        vx1 = (x1 >= 0) & (x1 < xdim)
        vy0 = (y0 >= 0) & (y0 < ydim)
        vy1 = (y1 >= 0) & (y1 < ydim)
        vz0 = (z0 >= 0) & (z0 < zdim)
        vz1 = (z1 >= 0) & (z1 < zdim)
        x0c = jnp.clip(x0, 0, xdim - 1)
        x1c = jnp.clip(x1, 0, xdim - 1)
        y0c = jnp.clip(y0, 0, ydim - 1)
        y1c = jnp.clip(y1, 0, ydim - 1)
        z0c = jnp.clip(z0, 0, zdim - 1)
        z1c = jnp.clip(z1, 0, zdim - 1)

        # lane one-hot lerp weights over the padded X axis
        wlane = (jnp.where(lane_x == x0c[..., None],
                           jnp.where(vx0, 1.0 - wx, 0.0)[..., None], 0.0)
                 + jnp.where(lane_x == x1c[..., None],
                             jnp.where(vx1, wx, 0.0)[..., None], 0.0))

        def row_pair(zc, yc, vzy):
            # fetch each ray's (z, y) volume row and reduce over x lanes
            rows_zy = jnp.take(vol2_ref[:], zc * ydim + yc, axis=0,
                               unique_indices=False, indices_are_sorted=False)
            val = jnp.sum(rows_zy * wlane, axis=2)
            return jnp.where(vzy, val, 0.0)

        d00 = row_pair(z0c, y0c, vz0 & vy0)
        d01 = row_pair(z0c, y1c, vz0 & vy1)
        d10 = row_pair(z1c, y0c, vz1 & vy0)
        d11 = row_pair(z1c, y1c, vz1 & vy1)
        density = ((1.0 - wz) * ((1.0 - wy) * d00 + wy * d01)
                   + wz * ((1.0 - wy) * d10 + wy * d11))

        # ---- transfer function: lane-replicated table, sublane gather
        t = (density - dmin) * inv_window
        xtf = t * tf_n - 0.5
        lof = jnp.floor(xtf)
        wtf = xtf - lof
        lo = jnp.clip(lof.astype(jnp.int32), 0, tf_n - 1)
        hi = jnp.clip(lof.astype(jnp.int32) + 1, 0, tf_n - 1)

        def tf_fetch(c):
            lo_v = jnp.take_along_axis(tf_ref[:], lo + c * tf_n, axis=0)
            hi_v = jnp.take_along_axis(tf_ref[:], hi + c * tf_n, axis=0)
            return lo_v * (1.0 - wtf) + hi_v * wtf

        cr = tf_fetch(0)
        cg = tf_fetch(1)
        cb = tf_fetch(2)
        ca = tf_fetch(3)

        a = jnp.minimum(ca, amax)
        a = jnp.where(active, a, 0.0)
        ta = tr * a
        r = r + ta * cr
        g = g + ta * cg
        b = b + ta * cb
        tr = tr * (1.0 - a)
        return k + 1, r, g, b, tr

    def cond(carry):
        k, r, g, b, tr = carry
        in_span = k < tile_steps
        if early_termination:
            alive = jnp.any((tr > termination_eps)
                            & (k.astype(f32) < k_exit))
            return in_span & alive
        return in_span

    zero = jnp.zeros((TILE_H, TILE_W), f32)
    k, r, g, b, tr = jax.lax.while_loop(
        cond, body, (jnp.int32(0), zero, zero, zero, jnp.ones_like(zero)))

    r_ref[:] = r
    g_ref[:] = g
    b_ref[:] = b
    a_ref[:] = jnp.where(hit, 1.0 - tr, 0.0)


@functools.lru_cache(maxsize=None)
def _build_forward(zdim, ydim, xdim, tf_n, height, width,
                   num_steps, step_size, early_termination, termination_eps,
                   interpret):
    xpad = _round_up(xdim, LANES)
    hp = _round_up(height, TILE_H)
    wp = _round_up(width, TILE_W)
    grid = (hp // TILE_H, wp // TILE_W)

    kernel = functools.partial(
        _march_kernel,
        zdim=zdim, ydim=ydim, xdim=xdim, xpad=xpad, tf_n=tf_n,
        num_steps=num_steps, step_size=step_size,
        early_termination=early_termination,
        termination_eps=termination_eps, height=height, width=width,
    )

    whole = lambda i, j: (0, 0)
    tile = lambda i, j: (i, j)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), whole, memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_H, TILE_W), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((zdim * ydim, xpad), whole,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * tf_n, LANES), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), tile, memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 4,
        interpret=interpret,
    )

    def forward(vol, tf, origin, dirs, dmin, dmax, smin, smax):
        vol2 = jnp.pad(vol, ((0, 0), (0, 0), (0, xpad - xdim))
                       ).reshape(zdim * ydim, xpad)
        # channel-major lane-replicated TF: row c*N+i = tf[i, c]
        tf_rep = jnp.broadcast_to(
            tf.T.reshape(4 * tf_n, 1), (4 * tf_n, LANES))
        inv_window = jnp.where(dmax - dmin > 0.0,
                               1.0 / jnp.maximum(dmax - dmin, 1e-30), 0.0)
        params = jnp.concatenate([
            origin.reshape(3), dmin[None], inv_window[None],
            smin.reshape(3), smax.reshape(3),
            jnp.zeros(5, jnp.float32),
        ]).reshape(1, 16)
        d = jnp.pad(dirs, ((0, hp - height), (0, wp - width), (0, 0)))
        r, g, b, a = call(params, d[..., 0], d[..., 1], d[..., 2],
                          vol2, tf_rep)
        return jnp.stack([r[:height, :width], g[:height, :width],
                          b[:height, :width], a[:height, :width]], axis=-1)

    return forward


@functools.lru_cache(maxsize=None)
def make_pallas_marcher(num_steps: int, step_size: float,
                        early_termination: bool, termination_eps: float,
                        interpret: bool | None = None):
    """Build the Pallas marcher with the same signature and ``custom_vjp``
    as :func:`core.fused.make_fused_marcher`.

    Forward runs the Pallas kernel; backward reuses the XLA re-march bwd
    from the fused path (the rgba output carries ``tr_final = 1 - alpha``,
    which is the only forward residual the bwd needs).  ``interpret=None``
    auto-selects interpreter mode off-TPU so tests run on CPU.
    """
    if interpret is None:
        # interpreter everywhere until Mosaic grows a large-source gather
        # (see module docstring); pass interpret=False to try compiling
        interpret = True

    fused = make_fused_marcher(num_steps, step_size, early_termination,
                               termination_eps)

    @jax.custom_vjp
    def march(vol, tf, origin, dirs, dmin, dmax, smin, smax):
        h, w = dirs.shape[:2]
        fwd = _build_forward(vol.shape[0], vol.shape[1], vol.shape[2],
                             tf.shape[0], h, w, num_steps, step_size,
                             early_termination, termination_eps, interpret)
        return fwd(vol, tf, origin, dirs, dmin, dmax, smin, smax)

    def march_fwd(vol, tf, origin, dirs, dmin, dmax, smin, smax):
        out = march(vol, tf, origin, dirs, dmin, dmax, smin, smax)
        return out, (vol, tf, origin, dirs, dmin, dmax, smin, smax, out)

    def march_bwd(res, g):
        vol, tf, origin, dirs, dmin, dmax, smin, smax, out = res
        # delegate to the fused marcher's re-march bwd via jax.vjp on its
        # primal (cheap: the fused bwd itself re-marches, nothing stored)
        _, vjp = jax.vjp(fused, vol, tf, origin, dirs, dmin, dmax,
                         smin, smax)
        return vjp(g)

    march.defvjp(march_fwd, march_bwd)
    return march
