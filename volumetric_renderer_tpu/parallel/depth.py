"""Depth-sharded rendering — the halo-sharded grid growth path.

The replicated-grid design (``parallel/render``) ends where one chip's
HBM does: a 1024^3 f32 grid is 4 GiB, and with gradients plus Adam
moments a training step needs >= 16 GiB — the whole of a v5e chip.  This
module shards the GRID itself over a ``"depth"`` mesh axis (SURVEY
§7.2.5 "v2"), keyed on one observation:

**Front-to-back compositing over disjoint depth segments is associative.**
With premultiplied partials ``(rgb, alpha)`` (``alpha = 1 - T``),

    front OVER back = (rgb_f + (1-alpha_f) * rgb_b,
                       1 - (1-alpha_f) * (1-alpha_b))

so each chip renders an *independent* partial image of just its chunk's
sample range and the partials combine in march order — no sequential
pipeline.  Per chip:

* the grid chunk: ``na/n_depth`` rows along the slab axis (+1 halo row
  fetched from the next chip with ONE ``ppermute`` — the trilinear +1
  corner; the last chip's halo is the transparent-black border),
* the production slab Pallas kernel, told its global ownership range
  through the gmeta ``a_start``/``chunk_end`` scalars
  (``kernels/slab.py``) — the same compiled kernel on every chip,
* one ``all_gather`` of ``(H, W, 4)`` partials over the depth axis and
  an associative fold.

Gradients: the grid's cotangent stays SHARDED (each chip owns its rows;
the halo row's gradient ppermutes back to its owner — the AD transpose
of the halo exchange, inserted automatically); the TF table and window
scalars are replicated over depth, so their cotangents all-reduce.

Costs vs replication, stated honestly: the forward is no longer
communication-free (one (H, W, 4) all_gather over ICI, ~8 MiB at 1080p
— negligible next to the march), every ray is marched by every chip for
its chunk's range (the k-interval skip keeps out-of-chunk tiles cheap),
and early termination cannot cross chunks (a ray saturated in a near
chunk still marches in far chunks).

Reference anchor: this distributes the sampling loop of
``res/shaders/volume.frag:29-50`` along the ray; the reference itself is
strictly single-GPU (SURVEY §2.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from volumetric_renderer_tpu.kernels.slab import _PERMS, make_slab_marcher
from volumetric_renderer_tpu.scene.camera import ray_grid
from volumetric_renderer_tpu.utils.config import RenderSettings

DEPTH_AXIS = "depth"


def over(front: jnp.ndarray, back: jnp.ndarray) -> jnp.ndarray:
    """Associative over-operator on premultiplied ``(H, W, 4)`` partials."""
    t = 1.0 - front[..., 3:4]
    rgb = front[..., :3] + t * back[..., :3]
    alpha = 1.0 - t[..., 0] * (1.0 - back[..., 3])
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def composite_chunks(partials, reverse: bool = False) -> jnp.ndarray:
    """Fold partial images in march order (ascending chunk index, or
    descending when the march runs toward -a)."""
    order = range(len(partials))
    if reverse:
        order = reversed(list(order))
    out = None
    for i in order:
        out = partials[i] if out is None else over(out, partials[i])
    return out


def depth_vol_spec(slab_axis: int) -> P:
    """PartitionSpec placing a ``(Z, Y, X)`` grid on the depth mesh: the
    slab axis's volume-array dimension shards, the rest replicate."""
    spec = [None] * 3
    spec[_PERMS[slab_axis][0]] = DEPTH_AXIS
    return P(*spec)


def make_depth_sharded_renderer(mesh, settings: RenderSettings,
                                *, vol_shape, slab_axis: int = 0,
                                slab_reverse: bool = False,
                                slab_mode: str = "exact",
                                interpret: bool = False,
                                jit: bool = True):
    """Build ``f(vol, tf, camera, dmin, dmax, smin, smax) -> (H, W, 4)``
    with the VOXEL GRID sharded over the mesh's ``"depth"`` axis.

    ``vol_shape`` is the GLOBAL grid shape; its extent along the slab
    axis must divide the depth-mesh size (pad the volume otherwise —
    zero rows compose to identity).  The camera must be concrete
    (``slab_axis``/``slab_reverse`` from ``choose_axis_from_camera``).
    ``jit=False`` returns the untraced function (for embedding in a
    larger jitted program, e.g. the depth-sharded train step, where the
    caller owns the shardings).
    """
    if DEPTH_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh needs a {DEPTH_AXIS!r} axis")
    n_depth = mesh.shape[DEPTH_AXIS]
    perm = _PERMS[slab_axis]
    na = vol_shape[perm[0]]
    if na % n_depth != 0:
        raise ValueError(f"grid a-extent {na} must divide the depth mesh "
                         f"({n_depth}); pad the volume")
    body = na // n_depth
    vax = perm[0]                       # volume array axis being sharded
    local_shape = tuple(body + 1 if i == vax else d
                        for i, d in enumerate(vol_shape))

    h, w = settings.height, settings.width

    # interpret-mode Pallas cannot run under vma checking (see
    # parallel/render.py); the psum placement flips with it.  A 1-chip
    # depth mesh (the degenerate single-device case) also cannot: vma
    # inference refuses to certify replication over a size-1 axis.
    check_vma = not interpret and n_depth > 1
    if check_vma:
        tf_axes = tuple(mesh.axis_names)            # replicated everywhere
        vol_axes = tuple(a for a in mesh.axis_names if a != DEPTH_AXIS)
    else:
        tf_axes, vol_axes = (), ()

    marcher = make_slab_marcher(
        settings.num_steps, settings.step_size,
        settings.early_termination, settings.termination_eps,
        local_shape, settings.tf_resolution, h, w,
        axis=slab_axis, reverse=slab_reverse, mode=slab_mode,
        interpret=interpret, vary_axes=tf_axes, vol_vary_axes=vol_axes,
        a_body=body, na_total=na)

    vol_spec = depth_vol_spec(slab_axis)
    rep = P()

    def shard_body(vol_local, tf, origin, dirs, dmin, dmax, smin, smax):
        idx = jax.lax.axis_index(DEPTH_AXIS)
        # halo: chip i receives chip i+1's first body row; the last chip
        # gets ppermute's zero fill — the transparent-black border
        first = jax.lax.slice_in_dim(vol_local, 0, 1, axis=vax)
        halo = jax.lax.ppermute(
            first, DEPTH_AXIS, [(i, i - 1) for i in range(1, n_depth)])
        chunk = jnp.concatenate([vol_local, halo], axis=vax)
        a_start = idx.astype(jnp.float32) * float(body)
        partial = marcher(chunk, tf, origin, dirs, dmin, dmax, smin, smax,
                          a_start)
        # march-order combine: one small image all_gather over ICI
        parts = jax.lax.all_gather(partial, DEPTH_AXIS, axis=0)
        return composite_chunks([parts[i] for i in range(n_depth)],
                                reverse=slab_reverse)

    sharded = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(vol_spec, rep, rep, rep, rep, rep, rep, rep),
        out_specs=rep,
        check_vma=check_vma,
    )

    def render_fn(vol, tf, camera, dmin, dmax, smin, smax):
        origin, dirs = ray_grid(
            camera, h, w, settings.fov_y_degrees, settings.near,
            settings.far)
        return sharded(vol, tf, origin + 0.5, dirs, dmin, dmax, smin, smax)

    if not jit:
        return render_fn
    return functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, vol_spec),
                      NamedSharding(mesh, rep)) + (None,) * 5,
    )(render_fn)
