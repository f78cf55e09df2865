"""Slab-streaming Pallas ray-march kernel — the TPU-native renderer core.

Re-designs the reference's fragment-shader march (``res/shaders/
volume.frag:21-51``: per-pixel ray, fixed step, trilinear ``sampler3D``
fetch, 1D transfer-function fetch, front-to-back compositing) for the
TPU memory hierarchy.  TPUs have no texture units and XLA's per-element
gather tops out around 29 M fetches/s on v5e, so the kernel replaces
*every* gather with MXU work and scalar-anchored dynamic slices:

  * The volume streams through VMEM one **z-slab** at a time (grid dim 0).
    Each slab is ``thick+1`` rows (one halo row for the trilinear +1
    corner).  Slabs ascend (or descend, for rays marching toward -z) the
    dominant camera axis, so every ray visits its samples in step order.
  * Pixels are packed into 16x16 **tiles** (grid dim 1, P=256 rays).  A
    tile's rays are coherent: at step k they occupy a small window of the
    slab.  Window anchors come from *scalar* conservative bounds (SMEM
    per-tile metadata), clipped to the volume because only in-cube
    samples contribute (masked compositing drops the rest).
  * Trilinear interpolation is computed as **one-hot tent matmuls**,
    shaped for the MXU's 128x128 tiles: the z-rows of the window merge
    into the contraction dim (one (P, zw*yw) @ (zw*yw, cw) matmul per
    step instead of zw K-padded ones) and the lane axis is trimmed to a
    128-wide c window, then an x-tent contraction over those lanes.
  * The transfer-function lookup is the same trick, transposed: the
    (8, ntf)-padded table against an (ntf, P) tent one-hot, so the
    matmul's minor dim is P rather than a zero-padded 8->128 — clamp-
    to-edge lerp exactly like the reference's 1D sampler
    (``offscreen_pass.cpp:1125-1150``).
  * Per-(slab, tile) step windows, a multi-level (zw, yw, cw) window
    switch with a full-face fallback, and an early-termination tile
    flag (SMEM, aliased in/out) skip work without data-dependent
    shapes.

Per-ray state (rgb, transmittance) lives in HBM as a (T, 8, P) array,
aliased input->output so writes at slab s are visible at slab s+1.

Forward semantics mirror ``core.fused._forward`` / ``core.blocked``
line-for-line (same float ops in the same order for pos, weights, TF
lerp, compositing, ALPHA_EPS clamp), so outputs match the XLA paths to
f32 rounding.  The march itself mirrors ``volume.frag:29-50`` with the
added early-termination improvement (absent in the reference, which
breaks only on cube exit, ``volume.frag:33-37``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volumetric_renderer_tpu.core.fused import ALPHA_EPS

import os as _os_tile

TILE_H = int(_os_tile.environ.get("VRT_TILE_H", "16"))
TILE_W = int(_os_tile.environ.get("VRT_TILE_W", "16"))
P = TILE_H * TILE_W

# axis -> permutation of volume axes (Z, Y, X) so the dominant axis leads.
# Kernel frame: A = slab axis, B = windowed axis (sublanes), C = lanes.
_PERMS = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}

# gmeta slot indices (global SMEM scalars, f32)
_G_DT, _G_NSTEPS, _G_DMIN, _G_INVW, _G_NTF, _G_AMAX, _G_EPS, _G_ET = range(8)
_G_SMINC, _G_SMINB, _G_SMINA, _G_SMAXC, _G_SMAXB, _G_SMAXA = range(8, 14)
_G_NC, _G_NB, _G_NA, _G_THICK, _G_NSLAB, _G_REV = range(14, 20)
_G_ASTART, _G_CEND = range(20, 22)   # chunk ownership (depth sharding)
_GMETA_LEN = 24

# tmeta slot indices (per-tile SMEM scalars, f32): conservative f-space
# bounds at k=0 and per-step drift, for the slab (a), windowed (b) and
# lane (c) axes.
_T_FA0_MIN, _T_FA0_MAX, _T_DFA_MIN, _T_DFA_MAX = range(4)
_T_FB0_MIN, _T_FB0_MAX, _T_DFB_MIN, _T_DFB_MAX = range(4, 8)
_T_FC0_MIN, _T_FC0_MAX, _T_DFC_MIN, _T_DFC_MAX = range(8, 12)
_TMETA_LEN = 12


def _ceil_div_f(num, den):
    """Scalar ceil(num/den) for f32 scalars, as int32."""
    return jnp.ceil(num / den).astype(jnp.int32)


def _k_interval(a_lb0, a_ub0, d_lb, d_ub, lo_plane, hi_plane, n_steps):
    """Steps k where a tile's conservative f-space interval along the slab
    axis can intersect [lo_plane, hi_plane).

    Bounds are linear in k: ub(k) = a_ub0 + k*d_ub, lb(k) = a_lb0 + k*d_lb
    (valid for k >= 0).  Need ub(k) >= lo_plane and lb(k) < hi_plane.
    Handles either march direction (all-positive or all-negative drift).
    """
    big = jnp.int32(2 ** 30)

    # condition 1: a_ub0 + k*d_ub >= lo_plane
    c1_lo = jnp.where(d_ub > 0, _ceil_div_f(lo_plane - a_ub0, d_ub), 0)
    c1_hi = jnp.where(d_ub < 0,
                      _ceil_div_f(lo_plane - a_ub0, d_ub), big)
    none1 = (d_ub == 0) & (a_ub0 < lo_plane)
    # condition 2: a_lb0 + k*d_lb < hi_plane
    c2_hi = jnp.where(d_lb > 0, _ceil_div_f(hi_plane - a_lb0, d_lb), big)
    c2_lo = jnp.where(d_lb < 0, _ceil_div_f(hi_plane - a_lb0, d_lb), 0)
    none2 = (d_lb == 0) & (a_lb0 >= hi_plane)

    k_lo = jnp.maximum(jnp.maximum(c1_lo, c2_lo), 0)
    k_hi = jnp.minimum(jnp.minimum(c1_hi, c2_hi), n_steps)
    k_hi = jnp.where(none1 | none2, 0, k_hi)
    return k_lo, k_hi


def _tent_lanes(idx, w, width, valid=None):
    """(P, width) tent matrix: (1-w) at lane idx, w at lane idx+1.

    Built arithmetically as ``relu(1 - |lane - (idx + w)|)`` — exactly
    (1-w) at lane ``idx`` and w at ``idx+1`` (f32-exact: ``idx + w``
    reconstructs the fractional coordinate whose floor produced them),
    in 4 VPU ops per element instead of two integer compares + selects
    (the tent build is the forward kernel's VPU hot spot).  Out-of-range
    lanes simply drop — exactly the transparent-black border of the
    reference's CLAMP_TO_BORDER sampler (offscreen_pass.cpp:1020-1030).
    ``valid`` optionally masks whole rays.
    """
    # int iota + cast: Mosaic's tpu.iota is integer-only (a raw f32 iota
    # trips a verifier error for shapes where the cast isn't auto-fused)
    lanes = jax.lax.broadcasted_iota(
        jnp.int32, (idx.shape[0], width), 1).astype(jnp.float32)
    f = idx.astype(jnp.float32) + w
    t = jnp.maximum(0.0, 1.0 - jnp.abs(lanes - f[:, None]))
    if valid is not None:
        t = jnp.where(valid[:, None], t, 0.0)
    return t


def _tf_weights_t(x, width):
    """(width, P) *transposed* clamp-to-edge lerp weights for the TF fetch.

    ``x`` is the RAW (unclipped) texel-space coordinate ``t*ntf - 0.5``.
    Weight (1-w) on clip(i0) and w on clip(i0+1); when both clamp to the
    same texel the weights sum to 1 — exactly ``tf[lo]*(1-wt) + tf[hi]*wt``
    (core.blocked's formulation).  Built as the tent
    ``relu(1 - |row - clip(x, 0, width-1)|)``: interior texels get the
    lerp weights verbatim, and clamping the *coordinate* reproduces the
    summed edge weight (a single 1.0 on the edge texel) — which is why
    the input must be unclipped: feeding ``clip(i0) + w`` would smear an
    out-of-range-below sample across texels 0 and 1.  Transposed so the
    fetch runs as ``(8, ntf) @ (ntf, P)``: the matmul's minor output dim
    is P (a full lane tile) instead of an 8->128 zero-padded one — 16x
    less MXU work than the (P, ntf) @ (ntf, 8) orientation.
    """
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (width, x.shape[0]), 0).astype(jnp.float32)
    f = jnp.clip(x, 0.0, float(width - 1))
    return jnp.maximum(0.0, 1.0 - jnp.abs(rows - f[None, :]))


def _make_kernel(*, thick, nb, nc, ntf, n_steps_static, levels, precision,
                 step_batch=1):
    """Build the kernel body for static slab geometry.

    levels: tuple of (zw, yw, cw) window sizes, smallest first; the last
    one must be (thick+1, nb, nc) (never misses).

    precision: MXU precision for the one-hot matmuls.  HIGHEST (bf16x6)
    reproduces f32 exactly -> 1-ulp parity with the XLA marchers;
    DEFAULT (bf16x3) is ~35% faster with error ~5e-4 — under half an
    8-bit display quantum (1/255), i.e. visually identical output.

    The gmeta scalars _G_ASTART/_G_CEND carry the *global* a-row range
    this kernel's slabs own — (0, na) for a whole-volume render; a
    chunk's [start, end) for the depth-sharded growth path
    (``parallel/depth``), where the slab array holds rows
    [a_start, chunk_end] (+1 halo) of a larger volume and samples outside
    the range belong to other chunks.  Traced scalars so the same
    compiled kernel serves every chip of a depth mesh
    (a_start = axis_index * body inside shard_map).
    step_batch: consecutive march steps processed per loop iteration
    (fused matmuls + amortized window/level overhead; see
    step_batch_body).
    """
    rows = thick + 1
    BATCH = step_batch

    def kernel(gmeta, tmeta, flag, rays, slab, tft, state,
               state_out, flag_out):
        dt = gmeta[0, 0, _G_DT]
        n_steps = gmeta[0, 0, _G_NSTEPS].astype(jnp.int32)
        dmin = gmeta[0, 0, _G_DMIN]
        inv_w = gmeta[0, 0, _G_INVW]
        amax = gmeta[0, 0, _G_AMAX]
        eps_t = gmeta[0, 0, _G_EPS]
        et_on = gmeta[0, 0, _G_ET] > 0.0
        na = gmeta[0, 0, _G_NA]
        thick_f = gmeta[0, 0, _G_THICK]
        n_slab = gmeta[0, 0, _G_NSLAB].astype(jnp.int32)
        rev = gmeta[0, 0, _G_REV] > 0.0

        a_start_f = gmeta[0, 0, _G_ASTART]
        cend = gmeta[0, 0, _G_CEND]

        s_log = pl.program_id(0)
        s_act = jnp.where(rev, n_slab - 1 - s_log, s_log)
        abase = a_start_f + s_act.astype(jnp.float32) * thick_f
        abase_i = a_start_f.astype(jnp.int32) + s_act * thick

        # cz-range owned by this slab: [lo_own, hi_own).  The globally
        # first slab also owns cz == -1 (the pos~0 edge whose -z corner
        # is the border); a chunk's last slab stops at the chunk end (the
        # next chunk owns from there).
        lo_own = jnp.where((s_act == 0) & (a_start_f == 0.0), -1.0, abase)
        hi_own = jnp.minimum(abase + thick_f, cend)

        k_lo, k_hi = _k_interval(
            tmeta[0, 0, _T_FA0_MIN], tmeta[0, 0, _T_FA0_MAX],
            tmeta[0, 0, _T_DFA_MIN], tmeta[0, 0, _T_DFA_MAX],
            lo_own, hi_own, n_steps)

        done = flag[0, 0, 0]

        def run():
            p0c = rays[0, 0, :]
            p0b = rays[0, 1, :]
            p0a = rays[0, 2, :]
            dc = rays[0, 3, :]
            db = rays[0, 4, :]
            da = rays[0, 5, :]
            hit = rays[0, 6, :] > 0.0

            sminc = gmeta[0, 0, _G_SMINC]
            sminb = gmeta[0, 0, _G_SMINB]
            smina = gmeta[0, 0, _G_SMINA]
            smaxc = gmeta[0, 0, _G_SMAXC]
            smaxb = gmeta[0, 0, _G_SMAXB]
            smaxa = gmeta[0, 0, _G_SMAXA]
            nc_f = gmeta[0, 0, _G_NC]
            nb_f = gmeta[0, 0, _G_NB]

            def step_batch_body(j, carry):
                """One loop iteration = BATCH consecutive steps: the
                window bounds / level switch / matmul dispatches run once
                per batch (bounds are linear in k, so the batch span's
                extremes are at its endpoint steps), the sample and TF
                fetches for all BATCH steps fuse into single MXU calls
                ((B*P, K) @ (K, cw) and (8, ntf) @ (ntf, B*P)), and only
                the compositing chain stays serial.  Early-termination
                masking moves into the composite phase: an ET-dead step
                may fetch a different TF bin than the step-serial kernel,
                but its contribution is exactly zero either way."""
                r, g, b, tr = carry
                k0 = k_lo + j * BATCH
                k0f = k0.astype(jnp.float32)
                kBf = k0f + float(BATCH - 1)

                # batch-span window bounds: linear in k => evaluate both
                # endpoint steps, clip to the volume / owned range
                def span(slot_min, slot_max, lo_clip, hi_clip):
                    d_min = tmeta[0, 0, slot_min + 2]
                    d_max = tmeta[0, 0, slot_max + 2]
                    lb = tmeta[0, 0, slot_min] + jnp.minimum(
                        k0f * d_min, kBf * d_min)
                    ub = tmeta[0, 0, slot_max] + jnp.maximum(
                        k0f * d_max, kBf * d_max)
                    return (jnp.maximum(lb, lo_clip),
                            jnp.minimum(ub, hi_clip))

                fa_lb, fa_ub = span(_T_FA0_MIN, _T_FA0_MAX, lo_own, hi_own)
                fb_lb, fb_ub = span(_T_FB0_MIN, _T_FB0_MAX, -1.0, nb_f)
                fc_lb, fc_ub = span(_T_FC0_MIN, _T_FC0_MAX, -1.0, nc_f)

                b_lo = jnp.floor(fb_lb).astype(jnp.int32)
                b_hi = jnp.floor(fb_ub).astype(jnp.int32) + 1  # +1 corner
                c_lo = jnp.floor(fc_lb).astype(jnp.int32)
                c_hi = jnp.floor(fc_ub).astype(jnp.int32) + 1
                a_lo = jnp.clip(jnp.floor(fa_lb).astype(jnp.int32) - abase_i,
                                0, rows - 1)
                a_hi = jnp.clip(
                    jnp.floor(fa_ub).astype(jnp.int32) + 1 - abase_i,
                    0, rows - 1)

                # per-sub-step geometry (identical float ops to
                # core.blocked.body)
                subs = []
                for bb in range(BATCH):
                    kf = k0f + float(bb)
                    tstep = kf * dt
                    pc = p0c + tstep * dc
                    pb = p0b + tstep * db
                    pa = p0a + tstep * da
                    inside = ((pc >= 0.0) & (pc <= 1.0)
                              & (pb >= 0.0) & (pb <= 1.0)
                              & (pa >= 0.0) & (pa <= 1.0))
                    sliced = ((pc < smaxc) & (pc > sminc)
                              & (pb < smaxb) & (pb > sminb)
                              & (pa < smaxa) & (pa > smina))
                    fc = pc * nc_f - 0.5
                    fb = pb * nb_f - 0.5
                    fa = pa * na - 0.5
                    cc = jnp.floor(fc)
                    cb = jnp.floor(fb)
                    ca = jnp.floor(fa)
                    wc = fc - cc
                    wb = fb - cb
                    wa = fa - ca
                    cc = cc.astype(jnp.int32)
                    cb = cb.astype(jnp.int32)
                    ca = ca.astype(jnp.int32)
                    owned = ((ca.astype(jnp.float32) >= lo_own)
                             & (ca.astype(jnp.float32) < hi_own))
                    # tr-independent activity; the ET part joins at
                    # composite time (mathematically identical: a dead
                    # step contributes exactly 0 whatever bin it fetched)
                    act_s = (inside & sliced & owned
                             & ((k0 + bb) < k_hi))
                    subs.append(dict(cc=cc, cb=cb, ca=ca, wc=wc, wb=wb,
                                     wa=wa, act=act_s))

                def wz_row(sub, z0, rr):
                    la = sub["ca"] - abase_i
                    return jnp.where(la == z0 + rr, 1.0 - sub["wa"],
                                     jnp.where(la + 1 == z0 + rr,
                                               sub["wa"], 0.0))

                def sample_level(zw, yw, cw):
                    """Densities for all BATCH sub-steps: (BATCH, P)."""
                    z0 = jnp.clip(a_lo, 0, rows - zw)
                    if yw >= nb and cw >= nc:
                        # full-face fallback: per-row matmuls, batched
                        # along the row axis of the one-hot operand
                        wyts = [_tent_lanes(s["cb"], s["wb"], nb)
                                for s in subs]
                        v1 = jnp.zeros((BATCH * P, nc), jnp.float32)
                        for rr in range(zw):
                            a_mat = jnp.concatenate(
                                [w * wz_row(s, z0, rr)[:, None]
                                 for s, w in zip(subs, wyts)], axis=0)
                            v1 = v1 + _pdot(a_mat, slab[0, z0 + rr, :, :],
                                            precision)
                        return [jnp.sum(v1[bb * P:(bb + 1) * P]
                                        * _tent_lanes(s["cc"], s["wc"], nc),
                                        axis=1)
                                for bb, s in enumerate(subs)]
                    # windowed path: ONE (BATCH*P, zw*yw) @ (zw*yw, cw)
                    # matmul; the slab window is shared by the batch
                    y0 = ((jnp.clip(b_lo, 0, nb - yw)) // 8) * 8
                    y0 = pl.multiple_of(y0, 8)
                    if cw >= nc:
                        c0 = None
                    else:
                        c0 = (jnp.clip(c_lo, 0, nc - cw) // 128) * 128
                        c0 = pl.multiple_of(c0, 128)

                    def b_win(rr):
                        if cw >= nc:
                            return slab[0, z0 + rr, pl.ds(y0, yw), :]
                        return slab[0, z0 + rr, pl.ds(y0, yw),
                                    pl.ds(c0, cw)]

                    a_rows = []
                    for s in subs:
                        wyt = _tent_lanes(s["cb"] - y0, s["wb"], yw)
                        a_rows.append(jnp.concatenate(
                            [wyt * wz_row(s, z0, rr)[:, None]
                             for rr in range(zw)], axis=1))
                    v1 = _pdot(
                        jnp.concatenate(a_rows, axis=0),
                        jnp.concatenate([b_win(rr) for rr in range(zw)],
                                        axis=0), precision)
                    outs = []
                    for bb, s in enumerate(subs):
                        lc = s["cc"] if c0 is None else s["cc"] - c0
                        wxt = _tent_lanes(lc, s["wc"], cw)
                        outs.append(jnp.sum(v1[bb * P:(bb + 1) * P] * wxt,
                                            axis=1))
                    return outs

                def fits(zw, yw, cw):
                    ok = (a_hi - jnp.clip(a_lo, 0, rows - zw)) <= zw - 1
                    if yw < nb:
                        y0c = ((jnp.clip(b_lo, 0, nb - yw)) // 8) * 8
                        ok = jnp.logical_and(ok, (b_hi - y0c) <= yw - 1)
                    if cw < nc:
                        c0c = (jnp.clip(c_lo, 0, nc - cw) // 128) * 128
                        ok = jnp.logical_and(ok, (c_hi - c0c) <= cw - 1)
                    return ok

                if len(levels) == 1:
                    densities = sample_level(*levels[0])
                else:
                    lvl = jnp.int32(len(levels) - 1)
                    for i in range(len(levels) - 2, -1, -1):
                        lvl = jnp.where(fits(*levels[i]), jnp.int32(i), lvl)
                    densities = jax.lax.switch(
                        lvl, [functools.partial(sample_level, zw, yw, cw)
                              for (zw, yw, cw) in levels])

                # TF fetch for the whole batch: one (8, ntf) @ (ntf, B*P)
                wtfs = []
                for s, density in zip(subs, densities):
                    t = (density - dmin) * inv_w
                    t = jnp.where(s["act"], t, 0.0)  # NaN containment
                    x = t * float(ntf) - 0.5
                    wtfs.append(_tf_weights_t(x, ntf))
                rgba_t = _pdot(tft[:, :], jnp.concatenate(wtfs, axis=1),
                               precision)

                # serial compositing chain (same float ops / order as the
                # step-serial kernel)
                for bb, s in enumerate(subs):
                    rgba = rgba_t[:, bb * P:(bb + 1) * P]
                    active = s["act"] & ((tr > eps_t)
                                         | jnp.logical_not(et_on))
                    a = jnp.minimum(rgba[3, :], amax)
                    a = jnp.where(active, a, 0.0)
                    ta = tr * a
                    r = r + ta * rgba[0, :]
                    g = g + ta * rgba[1, :]
                    b = b + ta * rgba[2, :]
                    tr = tr * (1.0 - a)
                return r, g, b, tr

            carry = (jnp.int32(0), state[0, 0, :], state[0, 1, :],
                     state[0, 2, :], state[0, 3, :])
            n_iter = (k_hi - k_lo + BATCH - 1) // BATCH

            # In-slab early termination (SURVEY hard-part 3, the other
            # half): the SMEM flag only skips FUTURE slabs; this exits the
            # k-loop as soon as every hit ray's transmittance is dead, so
            # an opaque surface mid-slab stops paying for the rest of the
            # slab's steps.  One (P,)->scalar lane reduction per
            # iteration; per-ray masking semantics are unchanged (a
            # dead-tile step composites exactly zero), so output is
            # bit-identical to the masked full loop.
            def loop_cond(c):
                j, _, _, _, tr = c
                live = jnp.max(jnp.where(hit, tr, 0.0))
                return (j < n_iter) & (jnp.logical_not(et_on)
                                       | (live > eps_t))

            def loop_body(c):
                j, r, g, b, tr = c
                r, g, b, tr = step_batch_body(j, (r, g, b, tr))
                return (j + 1, r, g, b, tr)

            _, r, g, b, tr = jax.lax.while_loop(loop_cond, loop_body,
                                                carry)
            state_out[0, 0, :] = r
            state_out[0, 1, :] = g
            state_out[0, 2, :] = b
            state_out[0, 3, :] = tr
            state_out[0, 4, :] = state[0, 4, :]
            state_out[0, 5, :] = state[0, 5, :]
            state_out[0, 6, :] = state[0, 6, :]
            state_out[0, 7, :] = state[0, 7, :]
            live = jnp.max(jnp.where(hit, tr, 0.0))
            flag_out[0, 0, 0] = jnp.where(et_on & (live <= eps_t),
                                          jnp.int32(1), jnp.int32(0))

        def skip():
            state_out[0] = state[0]
            flag_out[0, 0, 0] = done

        jax.lax.cond((done == 0) & (k_lo < k_hi), run, skip)

    return kernel


# Slab thickness targets (override for experiments via VRT_FWD_VMEM_MB /
# VRT_BWD_VMEM_MB / VRT_MIN_ROWS env vars).
import os as _os

_FWD_VMEM_BUDGET = int(_os.environ.get("VRT_FWD_VMEM_MB", "9")) * 2 ** 20
_MIN_ROWS = int(_os.environ.get("VRT_MIN_ROWS", "12"))
# Forward default step_batch=2: +6.6% measured on v5e (ABLATION_STEPBATCH_r04,
# 1.147M vs 1.076M rays/s at the flagship); hardware parity vs batch-1 at 0.0.
_STEP_BATCH = int(_os.environ.get("VRT_STEP_BATCH", "2"))
_BWD_STEP_BATCH = int(_os.environ.get("VRT_BWD_STEP_BATCH", "1"))


def _choose_thick(a_dim, b_dim, c_dim, vmem_budget=None, min_rows=None):
    """Slab thickness: rows fitting a double-buffered VMEM target, with a
    floor of ``_MIN_ROWS`` rows for large faces.

    Hardware-swept on v5e (1080p/512 steps, fast mode):

      256^3 (256 KiB/row):  thick 17 -> 2143 ms, 23 -> 2202, 31 -> 2276,
                            47 -> 2535  (9 MiB budget is the optimum;
                            thicker slabs inflate the full-face fallback
                            level, which runs one matmul per slab row)
      512^3 (1 MiB/row):    thick 3 -> 11045 ms, 5 -> 8389, 7 -> 7994,
                            11 -> 6327  (boundary-duplicated steps
                            dominate thin slabs: a tile's conservative
                            k-interval overlaps both neighbours)

    Hence: the 9 MiB double-buffered budget with a 12-row floor — both
    optima, and 512^3-sized slabs stay inside the 64 MiB Mosaic vmem
    limit set on the pallas calls (v5e has 128 MiB physical VMEM).
    """
    if vmem_budget is None:
        vmem_budget = _FWD_VMEM_BUDGET
    if min_rows is None:
        min_rows = _MIN_ROWS
    per_row = b_dim * c_dim * 4
    rows = max(3, min_rows, vmem_budget // (2 * per_row))
    thick = min(a_dim, rows - 1)
    # test-only clamp to force multi-slab decompositions at small grids
    # (hardware parity checks of the cross-slab state carry)
    force = _os.environ.get("VRT_MAX_THICK")
    if force:
        thick = min(thick, int(force))
    return int(thick)


# The backward keeps FOUR slab-sized buffers live (double-buffered volume
# slab in + double-buffered gradient slab out), so its slabs are thinner
# than the forward's: budget B => 2 slabs of B/2 => 4 buffers = 2B
# (~32 MiB of the 64 MiB Mosaic limit), plus (P, nb/nc)-sized step
# temporaries.
_BWD_VMEM_BUDGET = int(_os.environ.get("VRT_BWD_VMEM_MB", "6")) * 2 ** 20

# Scoped-VMEM ceiling for the backward pallas call.  At 512^3 the four
# live slab buffers (double-buffered volume in + gradient out, 12 rows x
# 1 MiB) plus step temporaries need 65.96 MiB (hardware-measured OOM at
# the former 64 MiB limit); v5e has 128 MiB physical VMEM, so the
# backward gets 100 MiB and `make_slab_bwd` clamps slab thickness so the
# slab buffers alone can never exceed limit - 40 MiB of headroom.
_BWD_VMEM_LIMIT = int(_os.environ.get("VRT_BWD_VMEM_LIMIT_MB", "100")) * 2 ** 20

# "high" is a MANUAL bf16x3 decomposition (Mosaic's dot lowering knows
# only DEFAULT and HIGHEST): x = hi + lo with hi = bf16(x); then
# x@y ~= hi@hy + (hi@ly + lo@hy) as three single-pass matmuls — half of
# HIGHEST's six passes at ~1e-6 relative error (hardware-measured in
# docs/PARITY.md).
_X3 = "bf16x3"
_X4 = "bf16x4"   # + the lo@lo term: ~6e-8 relative, 4 passes
_PRECISIONS = {
    "exact": jax.lax.Precision.HIGHEST,   # bf16x6: reproduces f32
    "high": _X3,                          # manual bf16x3: ~1e-6, ~2x faster
    "fast": jax.lax.Precision.DEFAULT,    # bf16x1: ~5e-4, fastest
}


def _split_bf16(x):
    # Mask the low 16 mantissa bits explicitly instead of a bf16 cast
    # round-trip: the compiler is free to elide f32->bf16->f32 (measured
    # on hardware — the cast form silently degraded to single-pass bf16),
    # while a bitwise AND cannot be folded away.  hi is exactly
    # bf16-representable, so the MXU's input truncation loses nothing.
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    return hi, x - hi


def _pdot(a, b, precision):
    """jnp.dot honoring the manual-bf16x3/x4 sentinels."""
    if precision is not _X3 and precision is not _X4:
        return jnp.dot(a, b, precision=precision,
                       preferred_element_type=jnp.float32)
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)

    def d(x, y):
        return jnp.dot(x, y, precision=jax.lax.Precision.DEFAULT,
                       preferred_element_type=jnp.float32)

    out = d(ah, bh) + (d(ah, bl) + d(al, bh))
    if precision is _X4:
        out = out + d(al, bl)
    return out


def _pdotg(a, b, dims, precision):
    """lax.dot_general honoring the manual-bf16x3/x4 sentinels."""
    if precision is not _X3 and precision is not _X4:
        return jax.lax.dot_general(a, b, dims, precision=precision,
                                   preferred_element_type=jnp.float32)
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)

    def d(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   precision=jax.lax.Precision.DEFAULT,
                                   preferred_element_type=jnp.float32)

    out = d(ah, bh) + (d(ah, bl) + d(al, bh))
    if precision is _X4:
        out = out + d(al, bl)
    return out


def _make_levels(rows, nb_dim, nc_dim, wide_min=None):
    """Window levels (zw, yw, cw), cheapest first; the last never misses.

    The windowed levels run the merged single-matmul path with K = zw*yw
    (sized to land on 128-lane K tiles) and, when it fits the tile's
    128-aligned lane window, a 128-lane c window.  Every 128-lane level
    is paired with a full-lane sibling so a c-window miss (the tile's
    x-range straddling a lane-tile boundary, ~20% of steps) degrades to
    the still-windowed full-lane form — NOT to the full-face fallback.
    """
    levels = []
    zw1 = min(4, rows)
    yw1 = 32 if nb_dim >= 48 else 16
    if rows > 4 and nb_dim >= 24:
        if nc_dim > 128:
            levels.append((zw1, yw1, 128))
        levels.append((zw1, yw1, nc_dim))
    if nb_dim >= 64 and rows > 8:
        if nc_dim > 128:
            levels.append((min(8, rows), 48, 128))
        levels.append((min(8, rows), 48, nc_dim))
    # Wide late-ray levels for LARGE faces: a tile's conservative b/c
    # windows grow ~linearly in k (ray-direction spread x step count x
    # grid size), so at 512^3 the late steps of oblique tiles overflow
    # the 48-row window and — without these — fall all the way to the
    # full-face per-row-matmul path.  (rows, 96, cw) costs
    # (BP/128)*(rows*96/128)*(cw/128) MXU units vs the full-face's
    # rows*(BP/128)*(nb/128)*(nc/128) — hardware-measured 1.95x on the
    # whole 512^3 forward (6,212.6 -> 3,180 ms) and -22% on the 256^3
    # backward (whose HIGHEST 6-pass density matmuls amplify window
    # size).  In the 256^3 forward the extra fits() checks cost 3.8% and
    # full-face is only moderately bigger, so the forward keeps the
    # default 384-face gate while the backward passes wide_min=256
    # (VRT_WIDE_LEVELS_MIN_NB overrides both for the hardware parity
    # gate, scripts/check_multislab_parity.py).
    if wide_min is None:
        wide_min = 384
    wide_min = int(_os.environ.get("VRT_WIDE_LEVELS_MIN_NB",
                                   str(wide_min)))
    if nb_dim >= wide_min and rows > 8:
        if nc_dim > 128:
            levels.append((rows, 96, 128))
        if nc_dim > 256:
            levels.append((rows, 96, 256))
        levels.append((rows, 96, nc_dim))
        if nb_dim >= 384:
            levels.append((rows, 224, nc_dim))
    levels.append((rows, nb_dim, nc_dim))
    return tuple(levels)


def _make_tilers(height, width):
    """Pack/unpack closures between (H, W) images and (T, P) tile rows."""
    ht = -(-height // TILE_H)
    wt = -(-width // TILE_W)
    n_tiles = ht * wt

    def pack(img_hw):
        x = jnp.pad(img_hw, ((0, ht * TILE_H - height),
                             (0, wt * TILE_W - width)))
        x = x.reshape(ht, TILE_H, wt, TILE_W)
        return x.transpose(0, 2, 1, 3).reshape(n_tiles, P)

    def unpack(tp):
        x = tp.reshape(ht, wt, TILE_H, TILE_W).transpose(0, 2, 1, 3)
        return x.reshape(ht * TILE_H, wt * TILE_W)[:height, :width]

    return pack, unpack, n_tiles


def _prep_inputs(origin, dirs, dmin, dmax, smin, smax, *, comps, reverse,
                 dims_abc, ntf, num_steps, step_size, early_termination,
                 termination_eps, thick, n_slab, pack, n_tiles,
                 a_start=0.0, a_body=None):
    """Shared fwd/bwd wrapper prep: ray rows, per-tile and global SMEM
    metadata.  Returns (rows_data [7 images], hit image, tmeta, gmeta)."""
    from volumetric_renderer_tpu.core.sampling import ray_box_intersect

    comp_a, comp_b, comp_c = comps
    na_dim, nb_dim, nc_dim = dims_abc

    t_entry, t_exit, hit = ray_box_intersect(origin, dirs)
    # Rays must march along the slab axis with a consistent sign (the
    # kernel visits slabs in that order).  For a reference-style orbit
    # camera (40 deg FoV, radius >= ~1.2) every cube-hitting ray
    # matches the camera's dominant-axis sign; the degenerate corner
    # rays that do not are masked to misses rather than composited in
    # the wrong depth order.
    sign = -1.0 if reverse else 1.0
    hit = hit & (dirs[..., comp_a] * sign >= 0.0)
    pos0 = jnp.clip(origin + t_entry[..., None] * dirs,
                    1e-6, 1.0 - 1e-6)
    pos0 = jnp.where(hit[..., None], pos0, 2.0)
    dirs_m = jnp.where(hit[..., None], dirs, 0.0)

    rows_data = [pos0[..., comp_c], pos0[..., comp_b], pos0[..., comp_a],
                 dirs_m[..., comp_c], dirs_m[..., comp_b],
                 dirs_m[..., comp_a],
                 hit.astype(jnp.float32)]

    # conservative f-space tile bounds along a (slab) and b (window)
    big = jnp.float32(1e30)

    def tile_minmax(val, pad):
        v = pack(val)
        h = pack(hit.astype(jnp.float32)) > 0.0
        vmin = jnp.min(jnp.where(h, v, big), axis=1) - pad
        vmax = jnp.max(jnp.where(h, v, -big), axis=1) + pad
        return vmin, vmax

    na_f, nb_f, nc_f = float(na_dim), float(nb_dim), float(nc_dim)
    fa0 = pos0[..., comp_a] * na_f - 0.5
    fb0 = pos0[..., comp_b] * nb_f - 0.5
    fc0 = pos0[..., comp_c] * nc_f - 0.5
    dfa = dirs_m[..., comp_a] * (step_size * na_f)
    dfb = dirs_m[..., comp_b] * (step_size * nb_f)
    dfc = dirs_m[..., comp_c] * (step_size * nc_f)
    pad = 1e-3
    fa0_min, fa0_max = tile_minmax(fa0, pad)
    fb0_min, fb0_max = tile_minmax(fb0, pad)
    fc0_min, fc0_max = tile_minmax(fc0, pad)
    dfa_min, dfa_max = tile_minmax(dfa, pad * step_size)
    dfb_min, dfb_max = tile_minmax(dfb, pad * step_size)
    dfc_min, dfc_max = tile_minmax(dfc, pad * step_size)
    tmeta = jnp.stack([fa0_min, fa0_max, dfa_min, dfa_max,
                       fb0_min, fb0_max, dfb_min, dfb_max,
                       fc0_min, fc0_max, dfc_min, dfc_max],
                      axis=1).reshape(n_tiles, 1, _TMETA_LEN)

    inv_w = jnp.where(dmax - dmin > 0.0,
                      1.0 / jnp.maximum(dmax - dmin, 1e-30), 0.0)
    sm = jnp.stack([smin[comp_c], smin[comp_b], smin[comp_a],
                    smax[comp_c], smax[comp_b], smax[comp_a]])
    gmeta = jnp.zeros((_GMETA_LEN,), jnp.float32)
    gmeta = gmeta.at[_G_DT].set(step_size)
    gmeta = gmeta.at[_G_NSTEPS].set(float(num_steps))
    gmeta = gmeta.at[_G_DMIN].set(dmin)
    gmeta = gmeta.at[_G_INVW].set(inv_w)
    gmeta = gmeta.at[_G_NTF].set(float(ntf))
    gmeta = gmeta.at[_G_AMAX].set(1.0 - ALPHA_EPS)
    gmeta = gmeta.at[_G_EPS].set(termination_eps)
    gmeta = gmeta.at[_G_ET].set(1.0 if early_termination else 0.0)
    gmeta = jax.lax.dynamic_update_slice(gmeta, sm, (_G_SMINC,))
    gmeta = gmeta.at[_G_NC].set(float(nc_dim))
    gmeta = gmeta.at[_G_NB].set(nb_f)
    gmeta = gmeta.at[_G_NA].set(na_f)
    gmeta = gmeta.at[_G_THICK].set(float(thick))
    gmeta = gmeta.at[_G_NSLAB].set(float(n_slab))
    gmeta = gmeta.at[_G_REV].set(1.0 if reverse else 0.0)
    a_start = jnp.asarray(a_start, jnp.float32)
    body_f = float(a_body) if a_body is not None else na_f
    gmeta = gmeta.at[_G_ASTART].set(a_start)
    gmeta = gmeta.at[_G_CEND].set(a_start + body_f)
    gmeta = gmeta.reshape(1, 1, _GMETA_LEN)
    return rows_data, hit, tmeta, gmeta


@functools.lru_cache(maxsize=None)
def make_slab_renderer(num_steps: int, step_size: float,
                       early_termination: bool, termination_eps: float,
                       vol_shape: tuple, ntf: int, height: int, width: int,
                       axis: int = 0, reverse: bool = False,
                       mode: str = "exact", interpret: bool = False,
                       vary_axes: tuple = (), a_body: int = None,
                       na_total: int = None, step_batch: int = 0):
    """Build the jittable slab-kernel forward for a static configuration.

    ``axis``: dominant camera axis in volume terms (0=z, 1=y, 2=x) — all
    rays must march with a consistent sign along it (guaranteed for any
    outside-the-volume camera with diagonal FoV < ~70°; use
    ``choose_axis``).  ``reverse``: True when that component is negative.

    ``vary_axes``: mesh axes this kernel runs under (inside ``shard_map``)
    — its outputs are declared varying over them (vma) so JAX's
    collective checker can verify the backward's psum placement.

    Depth-chunked rendering (``parallel/depth``, SURVEY §7.2.5 "v2"):
    pass ``vol_shape`` = the LOCAL chunk's shape (its a-extent = body
    rows + 1 halo row), ``a_body`` = its body row count, and
    ``na_total`` = the full volume's a-extent; the returned function then
    takes a trailing ``a_start`` scalar (the chunk's first global a-row,
    traced — ``axis_index * body`` inside shard_map).  The kernel owns
    exactly [a_start, a_start + a_body); partial images combine with the
    associative over-operator.

    Returns ``f(slabs, tf_table, origin, dirs, dmin, dmax, smin, smax
    [, a_start]) -> rgba (H, W, 4)`` where ``slabs = build_slabs(vol,
    axis)``.
    """
    perm = _PERMS[axis]
    zdim, ydim, xdim = vol_shape
    dims_zyx = (zdim, ydim, xdim)
    na_local = dims_zyx[perm[0]]
    nb_dim = dims_zyx[perm[1]]
    nc_dim = dims_zyx[perm[2]]
    chunked = na_total is not None
    body = a_body if a_body is not None else na_local
    na_math = na_total if chunked else na_local
    thick = _choose_thick(body, nb_dim, nc_dim)
    n_slab = -(-body // thick)
    rows = thick + 1
    # NOTE: the backward enables wide levels from 256 faces (its HIGHEST
    # density matmuls amplify window size); the forward measured WORSE
    # with them at 256^3 in BOTH modes (fast -3.8%, exact -18% — the
    # fwd's thicker slabs (rows 18 vs 12) make the wide levels' K=zw*yw
    # dimension much larger), so it keeps the default 384-face gate.
    levels = _make_levels(rows, nb_dim, nc_dim)

    _pack_tiles, _unpack_tiles, n_tiles = _make_tilers(height, width)

    # pts component index for each kernel axis (pts[...,0]=x ~ vol axis 2)
    comp_a, comp_b, comp_c = (2 - perm[0], 2 - perm[1], 2 - perm[2])

    precision = _PRECISIONS[mode]
    # step_batch 0 = the VRT_STEP_BATCH env default (explicit values are
    # part of the lru_cache key, so tests can build BATCH>1 kernels
    # without env tricks)
    kernel = _make_kernel(thick=thick, nb=nb_dim, nc=nc_dim, ntf=ntf,
                          n_steps_static=num_steps, levels=levels,
                          precision=precision,
                          step_batch=step_batch or _STEP_BATCH)

    def index_slab(s, t):
        return ((n_slab - 1 - s) if reverse else s, 0, 0, 0)

    grid_spec = pl.GridSpec(
        grid=(n_slab, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, _GMETA_LEN), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, _TMETA_LEN), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, P), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, nb_dim, nc_dim), index_slab,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ntf), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, P), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
    )

    vma = frozenset(vary_axes) if vary_axes else None
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, 8, P), jnp.float32,
                                        vma=vma),
                   jax.ShapeDtypeStruct((n_tiles, 1, 1), jnp.int32,
                                        vma=vma)),
        # State carries across slabs through these aliases on revisited
        # blocks.  CAVEAT: Pallas interpret mode does not honor aliasing
        # for revisited blocks (each slab would read the original state),
        # so interpret-mode runs are only correct single-slab; multi-slab
        # correctness is gated on hardware by
        # scripts/check_multislab_parity.py (maxerr 2e-6 at n_slab 4-8).
        input_output_aliases={6: 0, 2: 1},
        interpret=interpret,
        # large-volume slabs (512^3: 1 MiB/row) need more than the 16 MiB
        # default scoped-vmem flag; v5e has 128 MiB physical VMEM
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
    )

    def forward(slabs, tf_table, origin, dirs, dmin, dmax, smin, smax,
                a_start=0.0):
        rows_data, hit, tmeta, gmeta = _prep_inputs(
            origin, dirs, dmin, dmax, smin, smax,
            comps=(comp_a, comp_b, comp_c), reverse=reverse,
            dims_abc=(na_math, nb_dim, nc_dim), ntf=ntf,
            num_steps=num_steps, step_size=step_size,
            early_termination=early_termination,
            termination_eps=termination_eps, thick=thick, n_slab=n_slab,
            pack=_pack_tiles, n_tiles=n_tiles,
            a_start=a_start, a_body=body if chunked else None)
        rows_data = rows_data + [jnp.zeros_like(rows_data[0])]
        rays = jnp.stack([_pack_tiles(r) for r in rows_data], axis=1)

        # transposed (8, ntf): the kernels fetch via (8, ntf) @ (ntf, P)
        tft = jnp.pad(tf_table.astype(jnp.float32), ((0, 0), (0, 4))).T

        state0 = jnp.zeros((n_tiles, 8, P), jnp.float32)
        state0 = state0.at[:, 3, :].set(1.0)
        flags0 = jnp.zeros((n_tiles, 1, 1), jnp.int32)

        state, _ = call(gmeta, tmeta, flags0, rays, slabs, tft, state0)

        rimg = _unpack_tiles(state[:, 0, :])
        gimg = _unpack_tiles(state[:, 1, :])
        bimg = _unpack_tiles(state[:, 2, :])
        tr = _unpack_tiles(state[:, 3, :])
        alpha = jnp.where(hit, 1.0 - tr, 0.0)
        return jnp.stack([rimg, gimg, bimg, alpha], axis=-1)

    return forward


_PREC_NAMES = {"highest": jax.lax.Precision.HIGHEST, "x3": _X3, "x4": _X4,
               "fast": jax.lax.Precision.DEFAULT}


def _env_prec(name, default):
    """Per-matmul backward precision override for hardware cost/parity
    sweeps (VRT_BWD_{DENSITY,FETCH,DWTF,TFG,SCATTER}_PREC in
    {highest,x3,fast}); production modes never set these."""
    v = _os.environ.get(name, "")
    return _PREC_NAMES[v] if v else default


def _make_bwd_kernel(*, thick, nb, nc, ntf, levels, precision,
                     density_precision=None, step_batch=1):
    """Backward kernel: re-march slab-by-slab and accumulate gradients.

    The transpose of ``volume.frag:44-50``'s compositing via the fused
    prefix-sum identity (see ``core.fused``): with per-step opacity ``a_k``
    and transmittance ``T_k`` carried forward, ``dL/da_k`` needs only the
    running prefix ``P_k`` — so the backward is a second front-to-back
    march, not a reverse sweep.  Voxel gradients are the transpose of the
    forward's one-hot tent matmuls — more matmuls, accumulated into the
    gradient slab block that stays VMEM-resident across the tile sweep
    (SURVEY hard-part 4: per-tile VMEM accumulation instead of scatters).
    TF-table gradients are one ray-contracted matmul per step into a
    VMEM-resident transposed (8, ntf) accumulator.

    The gmeta _G_ASTART/_G_CEND chunk-ownership scalars work exactly as
    in ``_make_kernel`` (depth-sharded growth path).

    ``density_precision`` (default: ``precision``) sets the density
    *recompute* matmuls separately: gradient accuracy is dominated by
    DISCRETE flips — an approximate recomputed density can land in a
    different TF bin (different lo/hi ⇒ different lerp slope) than the
    forward did, an O(1) gradient error at a sparse voxel set — so the
    recompute must reproduce the exact forward while the smooth gradient
    matmuls tolerate lower precision (hardware-measured in
    docs/PARITY.md).
    """
    rows = thick + 1
    BATCH = step_batch
    if density_precision is None:
        density_precision = precision
    p_density = _env_prec("VRT_BWD_DENSITY_PREC", density_precision)
    p_fetch = _env_prec("VRT_BWD_FETCH_PREC", density_precision)
    p_dwtf = _env_prec("VRT_BWD_DWTF_PREC", precision)
    p_tfg = _env_prec("VRT_BWD_TFG_PREC", precision)
    p_scatter = _env_prec("VRT_BWD_SCATTER_PREC", precision)

    def kernel(gmeta, tmeta, flag, rays, slab, tft, state,
               state_out, flag_out, volg, tfg, sg):
        dt = gmeta[0, 0, _G_DT]
        n_steps = gmeta[0, 0, _G_NSTEPS].astype(jnp.int32)
        dmin = gmeta[0, 0, _G_DMIN]
        inv_w = gmeta[0, 0, _G_INVW]
        amax = gmeta[0, 0, _G_AMAX]
        eps_t = gmeta[0, 0, _G_EPS]
        et_on = gmeta[0, 0, _G_ET] > 0.0
        na = gmeta[0, 0, _G_NA]
        thick_f = gmeta[0, 0, _G_THICK]
        n_slab = gmeta[0, 0, _G_NSLAB].astype(jnp.int32)
        rev = gmeta[0, 0, _G_REV] > 0.0

        a_start_f = gmeta[0, 0, _G_ASTART]
        cend = gmeta[0, 0, _G_CEND]

        s_log = pl.program_id(0)
        t_id = pl.program_id(1)
        s_act = jnp.where(rev, n_slab - 1 - s_log, s_log)
        abase = a_start_f + s_act.astype(jnp.float32) * thick_f
        abase_i = a_start_f.astype(jnp.int32) + s_act * thick

        # Accumulator init on first visit of each output block.  The
        # gradient slab block is revisited across the whole tile sweep
        # (t innermost), the TF/scalar accumulators across the whole grid.
        @pl.when(t_id == 0)
        def _():
            volg[0] = jnp.zeros((rows, nb, nc), jnp.float32)

        @pl.when((s_log == 0) & (t_id == 0))
        def _():
            tfg[:, :] = jnp.zeros((8, ntf), jnp.float32)
            for i in range(8):
                sg[0, i] = 0.0

        lo_own = jnp.where((s_act == 0) & (a_start_f == 0.0), -1.0, abase)
        hi_own = jnp.minimum(abase + thick_f, cend)

        k_lo, k_hi = _k_interval(
            tmeta[0, 0, _T_FA0_MIN], tmeta[0, 0, _T_FA0_MAX],
            tmeta[0, 0, _T_DFA_MIN], tmeta[0, 0, _T_DFA_MAX],
            lo_own, hi_own, n_steps)

        done = flag[0, 0, 0]

        def run():
            p0c = rays[0, 0, :]
            p0b = rays[0, 1, :]
            p0a = rays[0, 2, :]
            dc = rays[0, 3, :]
            db = rays[0, 4, :]
            da = rays[0, 5, :]
            hit = rays[0, 6, :] > 0.0
            g_r = rays[0, 8, :]
            g_g = rays[0, 9, :]
            g_b = rays[0, 10, :]
            g_a = rays[0, 11, :]
            big_g = rays[0, 12, :]
            tr_fin = rays[0, 13, :]

            sminc = gmeta[0, 0, _G_SMINC]
            sminb = gmeta[0, 0, _G_SMINB]
            smina = gmeta[0, 0, _G_SMINA]
            smaxc = gmeta[0, 0, _G_SMAXC]
            smaxb = gmeta[0, 0, _G_SMAXB]
            smaxa = gmeta[0, 0, _G_SMAXA]
            nc_f = gmeta[0, 0, _G_NC]
            nb_f = gmeta[0, 0, _G_NB]

            def step_batch_body(j, carry):
                """One loop iteration = BATCH consecutive steps, the
                forward's step_batch_body mirrored for the gradient pass:
                window bounds and the level switch run once per batch,
                the density recompute / TF fetch / TF-table-grad /
                TF-slope / voxel-scatter matmuls fuse across the batch
                ((B*P, K)-shaped operands), and only the prefix-sum
                compositing chain stays serial.  ET masking joins at the
                serial chain exactly as in the forward: a dead step's
                recomputed density may land in a different TF bin than
                the step-serial kernel's (which zeroes t), but every one
                of its gradient contributions carries an exact zero
                weight either way."""
                tr, p, dming_v, dmaxg_v = carry
                k0 = k_lo + j * BATCH
                k0f = k0.astype(jnp.float32)
                kBf = k0f + float(BATCH - 1)

                def span(slot_min, slot_max, lo_clip, hi_clip):
                    d_min = tmeta[0, 0, slot_min + 2]
                    d_max = tmeta[0, 0, slot_max + 2]
                    lb = tmeta[0, 0, slot_min] + jnp.minimum(
                        k0f * d_min, kBf * d_min)
                    ub = tmeta[0, 0, slot_max] + jnp.maximum(
                        k0f * d_max, kBf * d_max)
                    return (jnp.maximum(lb, lo_clip),
                            jnp.minimum(ub, hi_clip))

                fa_lb, fa_ub = span(_T_FA0_MIN, _T_FA0_MAX, lo_own, hi_own)
                fb_lb, fb_ub = span(_T_FB0_MIN, _T_FB0_MAX, -1.0, nb_f)
                fc_lb, fc_ub = span(_T_FC0_MIN, _T_FC0_MAX, -1.0, nc_f)

                b_lo = jnp.floor(fb_lb).astype(jnp.int32)
                b_hi = jnp.floor(fb_ub).astype(jnp.int32) + 1  # +1 corner
                c_lo = jnp.floor(fc_lb).astype(jnp.int32)
                c_hi = jnp.floor(fc_ub).astype(jnp.int32) + 1
                a_lo = jnp.clip(jnp.floor(fa_lb).astype(jnp.int32) - abase_i,
                                0, rows - 1)
                a_hi = jnp.clip(
                    jnp.floor(fa_ub).astype(jnp.int32) + 1 - abase_i,
                    0, rows - 1)

                # per-sub-step geometry (identical float ops to the
                # forward kernel)
                subs = []
                for bb in range(BATCH):
                    kf = k0f + float(bb)
                    tstep = kf * dt
                    pc = p0c + tstep * dc
                    pb = p0b + tstep * db
                    pa = p0a + tstep * da
                    inside = ((pc >= 0.0) & (pc <= 1.0)
                              & (pb >= 0.0) & (pb <= 1.0)
                              & (pa >= 0.0) & (pa <= 1.0))
                    sliced = ((pc < smaxc) & (pc > sminc)
                              & (pb < smaxb) & (pb > sminb)
                              & (pa < smaxa) & (pa > smina))
                    fcc = pc * nc_f - 0.5
                    fbb = pb * nb_f - 0.5
                    faa = pa * na - 0.5
                    cc = jnp.floor(fcc)
                    cb = jnp.floor(fbb)
                    ca = jnp.floor(faa)
                    wc = fcc - cc
                    wb = fbb - cb
                    wa = faa - ca
                    cc = cc.astype(jnp.int32)
                    cb = cb.astype(jnp.int32)
                    ca = ca.astype(jnp.int32)
                    owned = ((ca.astype(jnp.float32) >= lo_own)
                             & (ca.astype(jnp.float32) < hi_own))
                    act_s = (inside & sliced & owned
                             & ((k0 + bb) < k_hi))
                    subs.append(dict(cc=cc, cb=cb, ca=ca, wc=wc, wb=wb,
                                     wa=wa, act=act_s))

                def wz_row(sub, z0, rr):
                    la = sub["ca"] - abase_i
                    return jnp.where(la == z0 + rr, 1.0 - sub["wa"],
                                     jnp.where(la + 1 == z0 + rr,
                                               sub["wa"], 0.0))

                def level_windows(yw, cw):
                    y0 = ((jnp.clip(b_lo, 0, nb - yw)) // 8) * 8
                    y0 = pl.multiple_of(y0, 8)
                    if cw >= nc:
                        c0 = None
                    else:
                        c0 = (jnp.clip(c_lo, 0, nc - cw) // 128) * 128
                        c0 = pl.multiple_of(c0, 128)
                    return y0, c0

                def sample_level(zw, yw, cw):
                    """Recomputed densities for all BATCH sub-steps."""
                    z0 = jnp.clip(a_lo, 0, rows - zw)
                    if yw >= nb and cw >= nc:
                        wyts = [_tent_lanes(s["cb"], s["wb"], nb)
                                for s in subs]
                        v1 = jnp.zeros((BATCH * P, nc), jnp.float32)
                        for rr in range(zw):
                            a_mat = jnp.concatenate(
                                [w * wz_row(s, z0, rr)[:, None]
                                 for s, w in zip(subs, wyts)], axis=0)
                            v1 = v1 + _pdot(a_mat, slab[0, z0 + rr, :, :],
                                            p_density)
                        return [jnp.sum(v1[bb * P:(bb + 1) * P]
                                        * _tent_lanes(s["cc"], s["wc"], nc),
                                        axis=1)
                                for bb, s in enumerate(subs)]
                    y0, c0 = level_windows(yw, cw)

                    def b_win(rr):
                        if cw >= nc:
                            return slab[0, z0 + rr, pl.ds(y0, yw), :]
                        return slab[0, z0 + rr, pl.ds(y0, yw),
                                    pl.ds(c0, cw)]

                    a_rows = []
                    for s in subs:
                        wyt = _tent_lanes(s["cb"] - y0, s["wb"], yw)
                        a_rows.append(jnp.concatenate(
                            [wyt * wz_row(s, z0, rr)[:, None]
                             for rr in range(zw)], axis=1))
                    v1 = _pdot(
                        jnp.concatenate(a_rows, axis=0),
                        jnp.concatenate([b_win(rr) for rr in range(zw)],
                                        axis=0), p_density)
                    outs = []
                    for bb, s in enumerate(subs):
                        lc = s["cc"] if c0 is None else s["cc"] - c0
                        wxt = _tent_lanes(lc, s["wc"], cw)
                        outs.append(jnp.sum(v1[bb * P:(bb + 1) * P] * wxt,
                                            axis=1))
                    return outs

                def fits(zw, yw, cw):
                    ok = (a_hi - jnp.clip(a_lo, 0, rows - zw)) <= zw - 1
                    if yw < nb:
                        y0c = ((jnp.clip(b_lo, 0, nb - yw)) // 8) * 8
                        ok = jnp.logical_and(ok, (b_hi - y0c) <= yw - 1)
                    if cw < nc:
                        c0c = (jnp.clip(c_lo, 0, nc - cw) // 128) * 128
                        ok = jnp.logical_and(ok, (c_hi - c0c) <= cw - 1)
                    return ok

                if len(levels) == 1:
                    lvl = jnp.int32(0)
                    densities = sample_level(*levels[0])
                else:
                    lvl = jnp.int32(len(levels) - 1)
                    for i in range(len(levels) - 2, -1, -1):
                        lvl = jnp.where(fits(*levels[i]), jnp.int32(i), lvl)
                    densities = jax.lax.switch(
                        lvl, [functools.partial(sample_level, zw, yw, cw)
                              for (zw, yw, cw) in levels])

                # TF lookup weights + bins for the whole batch
                ts, los, his, wtfs = [], [], [], []
                for s, density in zip(subs, densities):
                    t = (density - dmin) * inv_w
                    t = jnp.where(s["act"], t, 0.0)  # NaN containment
                    x = t * float(ntf) - 0.5
                    i0t = jnp.floor(x)
                    ts.append(t)
                    los.append(jnp.clip(i0t.astype(jnp.int32), 0, ntf - 1))
                    his.append(jnp.clip(i0t.astype(jnp.int32) + 1, 0,
                                        ntf - 1))
                    wtfs.append(_tf_weights_t(x, ntf))
                wtf_cat = jnp.concatenate(wtfs, axis=1)      # (ntf, B*P)
                rgba_cat = _pdot(tft[:, :], wtf_cat, p_fetch)

                # serial prefix-sum cotangent chain (core.fused.march_bwd
                # float ops in the same order)
                g_rows = []
                for bb, s in enumerate(subs):
                    rgba = rgba_cat[:, bb * P:(bb + 1) * P]
                    a_raw = rgba[3, :]
                    clamped = a_raw > amax
                    active = s["act"] & ((tr > eps_t)
                                         | jnp.logical_not(et_on))
                    a = jnp.where(active, jnp.minimum(a_raw, amax), 0.0)
                    gc_dot_c = (g_r * rgba[0, :] + g_g * rgba[1, :]
                                + g_b * rgba[2, :])
                    ta = tr * a
                    p_k = ta * gc_dot_c
                    p = p + p_k
                    s_k = big_g - p
                    one_minus_a = jnp.maximum(1.0 - a, ALPHA_EPS)
                    dL_da = (tr * gc_dot_c
                             + (g_a * tr_fin - s_k) / one_minus_a)
                    dL_da = jnp.where(active & jnp.logical_not(clamped),
                                      dL_da, 0.0)
                    act = jnp.where(active, 1.0, 0.0)
                    g_rows.append((ta * g_r * act, ta * g_g * act,
                                   ta * g_b * act, dL_da))
                    tr = tr * (1.0 - a)

                # (8, B*P) cotangent built row-by-row with lane broadcasts
                # (jnp.stack of (P,) pieces is a lanes->sublanes transpose
                # Mosaic cannot lay out; 1-D concatenation of the (P,)
                # pieces is also out — Mosaic only implements vector
                # concat offsets inside the first 128-lane tile — so the
                # pieces concat as (1, P) rows along lanes, which IS
                # supported at the P-aligned offsets)
                BP = BATCH * P

                def cat_lanes(pieces):
                    return jnp.concatenate(
                        [q.reshape(1, -1) for q in pieces], axis=1)

                rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, BP), 0)
                gr_cat = cat_lanes([gr[0] for gr in g_rows])
                gg_cat = cat_lanes([gr[1] for gr in g_rows])
                gb_cat = cat_lanes([gr[2] for gr in g_rows])
                da_cat = cat_lanes([gr[3] for gr in g_rows])
                g8_cat = (
                    jnp.where(rows8 == 0, gr_cat, 0.0)
                    + jnp.where(rows8 == 1, gg_cat, 0.0)
                    + jnp.where(rows8 == 2, gb_cat, 0.0)
                    + jnp.where(rows8 == 3, da_cat, 0.0))

                # TF-table gradient: ONE ray-contracted matmul per batch
                tfg[:, :] += _pdotg(
                    g8_cat, wtf_cat, (((1,), (1,)), ((), ())), p_tfg)

                # density cotangent via d rgba / dt = (tf[hi]-tf[lo]) * ntf
                trows = jax.lax.broadcasted_iota(jnp.int32, (ntf, BP), 0)
                lo_cat = cat_lanes(los)      # (1, BP) — see cat_lanes above
                hi_cat = cat_lanes(his)
                dwtf_cat = (jnp.where(trows == hi_cat, 1.0, 0.0)
                            - jnp.where(trows == lo_cat, 1.0, 0.0)
                            ) * float(ntf)
                drgba_cat = _pdot(tft[:, :], dwtf_cat, p_dwtf)
                dL_dt = jnp.sum(g8_cat * drgba_cat, axis=0)
                dd_cat = dL_dt * inv_w
                for bb, t in enumerate(ts):
                    sl = dL_dt[bb * P:(bb + 1) * P]
                    dming_v = dming_v + sl * (t - 1.0) * inv_w
                    dmaxg_v = dmaxg_v + sl * (-t) * inv_w

                # voxel-grid gradient: transpose of the tent matmuls,
                # batch-fused (accumulation over sub-steps IS the
                # contraction over the concatenated B*P ray axis),
                # accumulated into the VMEM-resident gradient slab block
                def scatter_level(zw, yw, cw):
                    z0 = jnp.clip(a_lo, 0, rows - zw)
                    if yw >= nb and cw >= nc:
                        ddwxt = jnp.concatenate(
                            [dd_cat[bb * P:(bb + 1) * P][:, None]
                             * _tent_lanes(s["cc"], s["wc"], nc)
                             for bb, s in enumerate(subs)], axis=0)
                        wyts = [_tent_lanes(s["cb"], s["wb"], nb)
                                for s in subs]
                        for rr in range(zw):
                            a_cat = jnp.concatenate(
                                [w * wz_row(s, z0, rr)[:, None]
                                 for s, w in zip(subs, wyts)], axis=0)
                            m = _pdotg(a_cat, ddwxt,
                                       (((0,), (0,)), ((), ())), p_scatter)
                            volg[0, z0 + rr, :, :] += m
                        return jnp.int32(0)
                    y0, c0 = level_windows(yw, cw)
                    ddwxt = jnp.concatenate(
                        [dd_cat[bb * P:(bb + 1) * P][:, None]
                         * _tent_lanes(
                             s["cc"] if c0 is None else s["cc"] - c0,
                             s["wc"], cw)
                         for bb, s in enumerate(subs)], axis=0)
                    a_rows = []
                    for s in subs:
                        wyt = _tent_lanes(s["cb"] - y0, s["wb"], yw)
                        a_rows.append(jnp.concatenate(
                            [wyt * wz_row(s, z0, rr)[:, None]
                             for rr in range(zw)], axis=1))
                    m_big = _pdotg(jnp.concatenate(a_rows, axis=0), ddwxt,
                                   (((0,), (0,)), ((), ())), p_scatter)
                    for rr in range(zw):
                        m = m_big[rr * yw:(rr + 1) * yw, :]
                        if cw >= nc:
                            volg[0, z0 + rr, pl.ds(y0, yw), :] += m
                        else:
                            volg[0, z0 + rr, pl.ds(y0, yw),
                                 pl.ds(c0, cw)] += m
                    return jnp.int32(0)

                if len(levels) == 1:
                    scatter_level(*levels[0])
                else:
                    jax.lax.switch(
                        lvl, [functools.partial(scatter_level, zw, yw, cw)
                              for (zw, yw, cw) in levels])

                return tr, p, dming_v, dmaxg_v

            # rows 2/3 of the state are always zero and pass through
            # unchanged -- loading them (rather than a jnp.zeros splat)
            # gives the accumulators a concrete, body-compatible layout
            carry = (jnp.int32(0), state[0, 0, :], state[0, 1, :],
                     state[0, 2, :], state[0, 3, :])
            n_iter = (k_hi - k_lo + BATCH - 1) // BATCH

            # in-slab early termination, mirroring the forward kernel:
            # once every hit ray's transmittance is dead, every remaining
            # step's gradient contribution is exactly zero, so the k-loop
            # exits instead of marching masked steps
            def loop_cond(c):
                j, tr = c[0], c[1]
                live = jnp.max(jnp.where(hit, tr, 0.0))
                return (j < n_iter) & (jnp.logical_not(et_on)
                                       | (live > eps_t))

            def loop_body(c):
                j = c[0]
                tr, p, dming_v, dmaxg_v = step_batch_body(
                    j, (c[1], c[2], c[3], c[4]))
                return (j + 1, tr, p, dming_v, dmaxg_v)

            _, tr, p, dming_v, dmaxg_v = jax.lax.while_loop(
                loop_cond, loop_body, carry)
            state_out[0, 0, :] = tr
            state_out[0, 1, :] = p
            for i in range(2, 8):
                state_out[0, i, :] = state[0, i, :]
            sg[0, 0] += jnp.sum(dming_v)
            sg[0, 1] += jnp.sum(dmaxg_v)
            live = jnp.max(jnp.where(hit, tr, 0.0))
            flag_out[0, 0, 0] = jnp.where(et_on & (live <= eps_t),
                                          jnp.int32(1), jnp.int32(0))

        def skip():
            state_out[0] = state[0]
            flag_out[0, 0, 0] = done

        jax.lax.cond((done == 0) & (k_lo < k_hi), run, skip)

    return kernel


@functools.lru_cache(maxsize=None)
def make_slab_bwd(num_steps: int, step_size: float,
                  early_termination: bool, termination_eps: float,
                  vol_shape: tuple, ntf: int, height: int, width: int,
                  axis: int = 0, reverse: bool = False,
                  mode: str = "exact", interpret: bool = False,
                  vary_axes: tuple = (), a_body: int = None,
                  na_total: int = None, step_batch: int = 0):
    """Build the Pallas backward for a static configuration.

    Returns ``bwd(vol, tf, origin, dirs, dmin, dmax, smin, smax, out, g)
    -> (vol_g, tf_g, dmin_g, dmax_g)`` where ``out`` is the forward's
    rgba image and ``g`` its cotangent.
    """
    perm = _PERMS[axis]
    zdim, ydim, xdim = vol_shape
    dims_zyx = (zdim, ydim, xdim)
    na_local = dims_zyx[perm[0]]
    nb_dim = dims_zyx[perm[1]]
    nc_dim = dims_zyx[perm[2]]
    chunked = na_total is not None
    body = a_body if a_body is not None else na_local
    na_math = na_total if chunked else na_local
    thick = _choose_thick(body, nb_dim, nc_dim,
                          vmem_budget=_BWD_VMEM_BUDGET)
    # Legal-thickness guard: the four slab-sized buffers (2x volume in +
    # 2x gradient out) must leave >= 40 MiB of the scoped limit for the
    # per-step temporaries, else clamp below the _MIN_ROWS floor (which
    # otherwise wins at large faces: 512^3 is 1 MiB/row).
    per_row = nb_dim * nc_dim * 4
    max_rows = max(4, (_BWD_VMEM_LIMIT - 40 * 2 ** 20) // (4 * per_row))
    max_rows = int(_os.environ.get("VRT_BWD_MAX_ROWS", str(max_rows)))
    thick = min(thick, int(max_rows) - 1)
    n_slab = -(-body // thick)
    rows = thick + 1
    levels = _make_levels(rows, nb_dim, nc_dim, wide_min=256)

    _pack_tiles, _unpack_tiles, n_tiles = _make_tilers(height, width)
    comp_a, comp_b, comp_c = (2 - perm[0], 2 - perm[1], 2 - perm[2])
    # Precision recipes, hardware-measured on v5e (r05 cost/parity sweep,
    # /tmp/bwd_cost_sweep.log + scripts/check_bwd_prec_parity.py):
    #   exact: density+grads HIGHEST             (parity 1.7e-5)
    #   high:  density HIGHEST, grads bf16x3     (parity 5.8e-5) <- default
    #   train: density bf16x3, grads bf16        (-28% step time; vol-grad
    #          cosine 0.996 vs exact, mean rel err 4e-2, max 5e-1 at
    #          bin-flip voxels: for throughput-bound training only)
    #   fast:  everything bf16                   (parity 7.2e-2)
    # The <1e-4 gate pins the density recompute at HIGHEST: TF-bin flips
    # dominate (x3 AND x4 both land at 7.19e-3 vol-grad err — the
    # residual is the MXU's bf16 truncation of the lo split operand, so
    # only the 3-way 6-pass split is f32-exact).
    if mode == "train":
        precision = jax.lax.Precision.DEFAULT
        density_precision = _X3
    else:
        precision = _PRECISIONS[mode]
        density_precision = (jax.lax.Precision.HIGHEST if mode != "fast"
                             else jax.lax.Precision.DEFAULT)
    kernel = _make_bwd_kernel(thick=thick, nb=nb_dim, nc=nc_dim, ntf=ntf,
                              levels=levels, precision=precision,
                              density_precision=density_precision,
                              step_batch=step_batch or _BWD_STEP_BATCH)

    def index_slab(s, t):
        return ((n_slab - 1 - s) if reverse else s, 0, 0, 0)

    grid_spec = pl.GridSpec(
        grid=(n_slab, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, _GMETA_LEN), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, _TMETA_LEN), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, P), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, nb_dim, nc_dim), index_slab,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ntf), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, P), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, nb_dim, nc_dim), index_slab,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ntf), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda s, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
    )

    vma = frozenset(vary_axes) if vary_axes else None
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, 8, P), jnp.float32,
                                        vma=vma),
                   jax.ShapeDtypeStruct((n_tiles, 1, 1), jnp.int32,
                                        vma=vma),
                   # per-shard partial gradients: varying until the
                   # custom-VJP bwd psums them over the mesh
                   jax.ShapeDtypeStruct((n_slab, rows, nb_dim, nc_dim),
                                        jnp.float32, vma=vma),
                   jax.ShapeDtypeStruct((8, ntf), jnp.float32, vma=vma),
                   jax.ShapeDtypeStruct((1, 8), jnp.float32, vma=vma)),
        input_output_aliases={6: 0, 2: 1},
        interpret=interpret,
        # 512^3 gradient slabs need 65.96 MiB scoped VMEM (measured);
        # see _BWD_VMEM_LIMIT above
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
    )

    inv_perm = tuple(int(i) for i in np.argsort(perm))

    def backward(vol, tf_table, origin, dirs, dmin, dmax, smin, smax,
                 out, g, a_start=0.0):
        slabs = build_slabs(vol, axis, thick=thick, body=body)
        rows_data, hit, tmeta, gmeta = _prep_inputs(
            origin, dirs, dmin, dmax, smin, smax,
            comps=(comp_a, comp_b, comp_c), reverse=reverse,
            dims_abc=(na_math, nb_dim, nc_dim), ntf=ntf,
            num_steps=num_steps, step_size=step_size,
            early_termination=early_termination,
            termination_eps=termination_eps, thick=thick, n_slab=n_slab,
            pack=_pack_tiles, n_tiles=n_tiles,
            a_start=a_start, a_body=body if chunked else None)

        g_rgb = g[..., :3]
        g_alpha = jnp.where(hit, g[..., 3], 0.0)
        big_g = jnp.sum(g_rgb * out[..., :3], axis=-1)
        tr_fin = 1.0 - out[..., 3]  # miss rays have alpha == 0 -> tr 1
        zero_img = jnp.zeros_like(rows_data[0])
        rows_data = rows_data + [zero_img, g[..., 0], g[..., 1], g[..., 2],
                                 g_alpha, big_g, tr_fin, zero_img, zero_img]
        rays = jnp.stack([_pack_tiles(r) for r in rows_data], axis=1)

        # transposed (8, ntf): the kernels fetch via (8, ntf) @ (ntf, P)
        tft = jnp.pad(tf_table.astype(jnp.float32), ((0, 0), (0, 4))).T
        state0 = jnp.zeros((n_tiles, 8, P), jnp.float32)
        state0 = state0.at[:, 0, :].set(1.0)  # transmittance
        flags0 = jnp.zeros((n_tiles, 1, 1), jnp.int32)

        _, _, volg, tfg, sg = call(gmeta, tmeta, flags0, rays, slabs,
                                   tft, state0)

        # reassemble: body rows tile the padded axis; halo rows (shared
        # with the next slab's row 0) add at the slab boundaries
        body_g = volg[:, :thick].reshape(n_slab * thick, nb_dim, nc_dim)
        vg_p = jnp.concatenate(
            [body_g, jnp.zeros((1, nb_dim, nc_dim), jnp.float32)])
        halo_rows = thick * (jnp.arange(n_slab, dtype=jnp.int32) + 1)
        vg_p = vg_p.at[halo_rows].add(volg[:, thick])
        vol_g = jnp.transpose(vg_p[:na_local], inv_perm)
        return vol_g, tfg[:4, :].T, sg[0, 0], sg[0, 1]

    return backward


def build_slabs(vol: jnp.ndarray, axis: int = 0,
                thick: int | None = None,
                body: int | None = None) -> jnp.ndarray:
    """Decompose ``vol[Z, Y, X]`` into halo'd slabs along ``axis``.

    Returns ``(S, thick+1, B, C)`` f32 with one halo row per slab (the
    trilinear +1 corner) and zero padding past the volume edge — the
    transparent-black border, materialized.

    ``body``: how many leading a-rows are *owned* rows (slab count is
    ``ceil(body / thick)``); the remainder of the input (e.g. a depth
    chunk's +1 halo row from the neighbouring chunk) only fills slab
    halos.  Default: the whole input.
    """
    vol = jnp.asarray(vol, jnp.float32)
    vp = jnp.transpose(vol, _PERMS[axis])
    a_dim, b_dim, c_dim = vp.shape
    if body is None:
        body = a_dim
    if thick is None:
        thick = _choose_thick(body, b_dim, c_dim)
    n_slab = -(-body // thick)
    vp = jnp.pad(vp, ((0, max(0, n_slab * thick + 1 - a_dim)), (0, 0),
                      (0, 0)))
    return jnp.stack([
        jax.lax.dynamic_slice_in_dim(vp, s * thick, thick + 1, axis=0)
        for s in range(n_slab)])


def count_envelope_violations_rays(origin, dirs, axis: int,
                                   reverse: bool) -> int:
    """Count cube-hitting rays that oppose the slab march direction.

    The kernel composites slabs in one direction along the dominant axis;
    a ray whose component along that axis has the opposite sign would be
    composited back-to-front, so ``_prep_inputs`` masks it to a miss.
    This counts such rays (in *texture space*: ``origin`` already +0.5)
    so callers handing the kernel arbitrary rays can fail loudly instead
    of silently dropping pixels.
    """
    from volumetric_renderer_tpu.core.sampling import ray_box_intersect

    origin = np.asarray(origin)
    dirs = np.asarray(dirs)
    _, _, hit = ray_box_intersect(jnp.asarray(origin), jnp.asarray(dirs))
    comp_a = 2 - _PERMS[axis][0]
    sign = -1.0 if reverse else 1.0
    bad = np.asarray(hit) & (dirs[..., comp_a] * sign < 0.0)
    return int(bad.sum())


def count_envelope_violations(camera, height: int, width: int,
                              axis: int, reverse: bool,
                              fov_y_degrees: float = 40.0,
                              near: float = 0.1, far: float = 10.0) -> int:
    """:func:`count_envelope_violations_rays` on a concrete camera's grid.

    For the orbit-camera model this is provably always 0, at ANY FoV or
    radius — not just the reference envelope (40 deg FoV, radius >= ~1.2,
    ``camera.cpp:31-34``): the camera looks at the cube center, so the
    dominant axis of the look direction is the axis of the camera's
    largest |position| component; a camera *outside* the cube has that
    component > 0.5, putting the entire cube strictly on one side along
    the slab axis, so every camera->cube-point direction shares one sign;
    a camera *inside* the cube hits nothing at all (``ray_box_intersect``
    requires ``t_entry >= 0`` — the reference's back-face culling,
    ``offscreen_pass.cpp:680``).  The check is kept as defense-in-depth
    for the ray-level kernel API and any future non-orbit camera;
    ``tests/test_slab.py`` pins both facts.
    """
    from volumetric_renderer_tpu.scene.camera import ray_grid

    # the camera is concrete, but under a jit trace every jnp op is
    # staged regardless (omnistaging) — force compile-time evaluation so
    # this check stays a trace-time constant
    with jax.ensure_compile_time_eval():
        origin, dirs = ray_grid(camera, height, width, fov_y_degrees,
                                near, far)
        return count_envelope_violations_rays(np.asarray(origin) + 0.5,
                                              np.asarray(dirs), axis,
                                              reverse)


def choose_axis(camera_forward) -> tuple:
    """Pick (axis, reverse) from a *concrete* camera forward vector.

    axis 0/1/2 = volume z/y/x; ``camera_forward`` in (x, y, z) order.
    """
    f = np.asarray(camera_forward, np.float64)
    comp = np.array([f[2], f[1], f[0]])  # vol-axis order z, y, x
    axis = int(np.argmax(np.abs(comp)))
    return axis, bool(comp[axis] < 0)


def choose_axis_from_camera(camera) -> tuple:
    """(axis, reverse) for an :class:`~volumetric_renderer_tpu.scene.camera.
    OrbitCamera` — the camera's look direction is ``center - position``.

    The camera's leaves must be concrete (a closed-over camera under
    ``jit`` qualifies; a camera passed as a jit *argument* does not): the
    slab order is a compile-time property of the kernel.  The look
    direction is computed in NumPy — any jnp op would be traced into the
    surrounding jaxpr and stop being inspectable.  Raises ``TypeError``
    for traced cameras with a pointer at the static-argument escape hatch.
    """
    try:
        q = np.asarray(camera.orientation, np.float64)
    except Exception as e:  # jax TracerArrayConversionError and friends
        raise TypeError(
            "method='slab' needs a concrete camera to pick the slab axis "
            "at trace time; close over the camera or pass axis/reverse "
            "explicitly (kernels.slab.make_slab_marcher)."
        ) from e
    # look dir = center - position = radius * (q rot (0,-1,0)); radius > 0
    # never flips it, so rotate (0,-1,0) by q (Rodrigues) and pick from that.
    w, u = q[0], q[1:]
    v = np.array([0.0, -1.0, 0.0])
    uv = np.cross(u, v)
    fwd = v + 2.0 * (w * uv + np.cross(u, uv))
    return choose_axis(fwd)


@functools.lru_cache(maxsize=None)
def make_slab_marcher(num_steps: int, step_size: float,
                      early_termination: bool, termination_eps: float,
                      vol_shape: tuple, ntf: int, height: int, width: int,
                      axis: int = 0, reverse: bool = False,
                      mode: str = "exact", interpret: bool = False,
                      vary_axes: tuple = (), bwd: str = "slab",
                      bwd_mode: str = "high", a_body: int = None,
                      na_total: int = None, vol_vary_axes: tuple = None,
                      step_batch: int = 0, bwd_step_batch: int = 0):
    """Slab kernel with the standard marcher signature and a custom VJP.

    ``f(vol, tf, origin, dirs, dmin, dmax, smin, smax) -> rgba`` — the
    same contract as ``core.fused.make_fused_marcher``: the forward is the
    Pallas slab kernel (volume decomposed via :func:`build_slabs` under
    jit).  ``vary_axes`` names the mesh axes to psum grid/TF gradients
    over when the marcher runs inside a ``shard_map`` with vma checking ON
    (``check_vma=True``); under ``check_vma=False`` shard_map's transpose
    psums replicated-input cotangents itself — pass ``vary_axes=()`` there
    or gradients double-count (see ``parallel/render.py``).
    ``bwd="slab"`` (default) runs the TPU-native Pallas backward
    (:func:`make_slab_bwd`: slab re-march, VMEM-accumulated voxel/TF
    gradients — the north-star custom VJP); ``bwd="fused"`` delegates to
    the XLA fused re-march (``core.fused``), kept as the semantics
    reference and scatter-based fallback.
    """
    rend = make_slab_renderer(num_steps, step_size, early_termination,
                              termination_eps, vol_shape, ntf, height,
                              width, axis=axis, reverse=reverse,
                              mode=mode, interpret=interpret,
                              vary_axes=vary_axes, a_body=a_body,
                              na_total=na_total, step_batch=step_batch)
    if vol_vary_axes is None:
        vol_vary_axes = vary_axes
    chunked = na_total is not None
    if chunked and bwd != "slab":
        raise ValueError("depth-chunked marchers need bwd='slab'")
    # forward slab geometry must match the renderer's
    dims_zyx = tuple(vol_shape)
    nb_d = dims_zyx[_PERMS[axis][1]]
    nc_d = dims_zyx[_PERMS[axis][2]]
    fwd_body = a_body if a_body is not None else dims_zyx[_PERMS[axis][0]]
    fwd_thick = _choose_thick(fwd_body, nb_d, nc_d)

    @jax.custom_vjp
    def march(vol, tf, origin, dirs, dmin, dmax, smin, smax, a_start):
        slabs = build_slabs(vol, axis, thick=fwd_thick, body=fwd_body)
        return rend(slabs, tf, origin, dirs, dmin, dmax, smin, smax,
                    a_start)

    def march_fwd(vol, tf, origin, dirs, dmin, dmax, smin, smax, a_start):
        out = march(vol, tf, origin, dirs, dmin, dmax, smin, smax, a_start)
        return out, (vol, tf, origin, dirs, dmin, dmax, smin, smax,
                     a_start, out)

    if bwd == "slab":
        # ``bwd_mode`` sets the backward's gradient-matmul precision;
        # the density recompute stays exact in every mode but "fast"
        # (approximate densities flip TF-bin indices — see
        # _make_bwd_kernel).  Hardware-measured (docs/PARITY.md):
        # "exact" 4.6x fwd / grad parity 1.7e-5; "high" (default,
        # manual bf16x3) 3.8x fwd / 5.8e-5 — both inside the 1e-4
        # BASELINE bound; "fast" 2.1x fwd / 7e-2 (training only).
        # With mode="fast" the saved forward output seeds the suffix
        # term (big_g / tr_fin), so gradient accuracy is additionally
        # bounded by the forward's approximation error.
        bwd_fn = make_slab_bwd(num_steps, step_size, early_termination,
                               termination_eps, vol_shape, ntf, height,
                               width, axis=axis, reverse=reverse,
                               mode=bwd_mode, interpret=interpret,
                               a_body=a_body, na_total=na_total,
                               step_batch=bwd_step_batch)

        def march_bwd(res, g):
            (vol, tf, origin, dirs, dmin, dmax, smin, smax, a_start,
             out) = res
            vol_g, tf_g, dmin_g, dmax_g = bwd_fn(
                vol, tf, origin, dirs, dmin, dmax, smin, smax, out, g,
                a_start)
            if vary_axes:
                # replicated-input cotangents all-reduce over the mesh —
                # the north-star grid/TF gradient psum over ICI.  A
                # depth-sharded grid is NOT replicated over the depth
                # axis, so its grads psum only over vol_vary_axes (the
                # pixel axes).
                tf_g, dmin_g, dmax_g = jax.lax.psum(
                    (tf_g, dmin_g, dmax_g), vary_axes)
                if vol_vary_axes:
                    vol_g = jax.lax.psum(vol_g, vol_vary_axes)
            zeros3 = jnp.zeros(3, jnp.float32)
            return (vol_g, tf_g, jnp.zeros_like(origin),
                    jnp.zeros_like(dirs), dmin_g, dmax_g, zeros3, zeros3,
                    jnp.zeros((), jnp.float32))
    else:
        from volumetric_renderer_tpu.core.fused import make_fused_marcher

        fused = make_fused_marcher(num_steps, step_size, early_termination,
                                   termination_eps, vary_axes=vary_axes)

        def march_bwd(res, g):
            vol, tf, origin, dirs, dmin, dmax, smin, smax, _, _ = res
            _, vjp = jax.vjp(fused, vol, tf, origin, dirs, dmin, dmax,
                             smin, smax)
            return vjp(g) + (jnp.zeros((), jnp.float32),)

    march.defvjp(march_fwd, march_bwd)
    if chunked:
        return march               # f(..., a_start) — depth-chunk form
    return functools.wraps(march)(
        lambda vol, tf, origin, dirs, dmin, dmax, smin, smax: march(
            vol, tf, origin, dirs, dmin, dmax, smin, smax,
            jnp.float32(0.0)))
