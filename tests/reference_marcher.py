"""Independent NumPy transliteration of the reference renderer.

This is the *golden* implementation used to validate the JAX oracle and the
Pallas kernel: a direct, slow, NumPy-only restatement of

  * ``res/shaders/volume.vert`` + the rasterizer (replaced by analytic
    pixel-center unprojection through glm-style matrices),
  * ``res/shaders/volume.frag:21-51`` (the march loop, one Python iteration
    per step),
  * the Vulkan sampler configs (3D: linear + clamp-to-border transparent
    black, ``offscreen_pass.cpp:1014-1039``; 1D TF: linear + clamp-to-edge,
    ``offscreen_pass.cpp:1125-1150``),
  * the orbit camera (``src/scene/camera.cpp``) and UBO matrix setup
    (``offscreen_pass.cpp:1152-1171``).

Deliberately written against the GLSL/C++ spec, not against the framework
code, so implementation bugs cannot cancel out.
"""

from __future__ import annotations

import numpy as np


# -- glm-style quaternion / matrix helpers (float64 for reference accuracy) --

def quat_axis_angle(axis, angle_rad):
    axis = np.asarray(axis, dtype=np.float64)
    return np.concatenate([[np.cos(angle_rad / 2)], axis * np.sin(angle_rad / 2)])


def quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_rot(q, v):
    w, u = q[0], np.asarray(q[1:])
    uv = np.cross(u, v)
    return np.asarray(v) + 2.0 * (w * uv + np.cross(u, uv))


def quat_mat3(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class RefCamera:
    """src/scene/camera.cpp transliterated."""

    def __init__(self):
        self.center = np.zeros(3)
        self.orientation = quat_axis_angle([0.0, 0.0, 1.0], np.pi)
        self.radius = 3.0

    def rotate(self, delta):
        ang = np.asarray(delta, dtype=np.float64) * 0.25
        yaw = quat_axis_angle([0, 0, 1], np.deg2rad(-ang[0]))
        self.orientation = quat_mul(yaw, self.orientation)
        right = quat_rot(self.orientation, [1.0, 0.0, 0.0])
        pitch = quat_axis_angle(right, np.deg2rad(ang[1]))
        self.orientation = quat_mul(pitch, self.orientation)

    def zoom(self, delta):
        self.radius = np.clip(self.radius - delta, 0.1, 10.0)

    def position(self):
        fwd = quat_rot(self.orientation, [0.0, -1.0, 0.0])
        return self.center + self.radius * -fwd

    def view(self):
        t = np.eye(4)
        t[:3, 3] = -self.position()
        r = np.eye(4)
        r[:3, :3] = quat_mat3(self.orientation).T
        return r @ t


def ref_projection(aspect, fov_deg=40.0, near=0.1, far=10.0):
    """glm::perspectiveRH_ZO(40deg) * rotX(90deg)*scale(-1,1,1)."""
    t = np.tan(np.deg2rad(fov_deg) / 2)
    p = np.zeros((4, 4))
    p[0, 0] = 1 / (aspect * t)
    p[1, 1] = 1 / t
    p[2, 2] = far / (near - far)
    p[2, 3] = -(far * near) / (far - near)
    p[3, 2] = -1.0
    rot_x = np.eye(4)
    rot_x[1, 1], rot_x[1, 2] = 0.0, -1.0
    rot_x[2, 1], rot_x[2, 2] = 1.0, 0.0
    scale = np.diag([-1.0, 1.0, 1.0, 1.0])
    return p @ rot_x @ scale


def ref_rays(camera: RefCamera, height, width, fov_deg=40.0, near=0.1, far=10.0):
    """Pixel-center rays via inverse(proj*view); row 0 = top (Vulkan NDC)."""
    m = ref_projection(width / height, fov_deg, near, far) @ camera.view()
    m_inv = np.linalg.inv(m)
    dirs = np.zeros((height, width, 3))
    for i in range(height):
        for j in range(width):
            ndc_x = 2.0 * (j + 0.5) / width - 1.0
            ndc_y = 2.0 * (i + 0.5) / height - 1.0
            pts = []
            for z in (0.2, 0.8):
                h = m_inv @ np.array([ndc_x, ndc_y, z, 1.0])
                pts.append(h[:3] / h[3])
            d = pts[1] - pts[0]
            dirs[i, j] = d / np.linalg.norm(d)
    return camera.position(), dirs


# -- Vulkan sampler emulation ------------------------------------------------

def sample3d_border(vol, u):
    """texture(u_volume, u).r — linear filter, clamp-to-border black."""
    zdim, ydim, xdim = vol.shape
    dims = np.array([xdim, ydim, zdim], dtype=np.float64)
    f = np.asarray(u, dtype=np.float64) * dims - 0.5
    i0 = np.floor(f).astype(np.int64)
    w = f - i0
    total = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix, iy, iz = i0[0] + dx, i0[1] + dy, i0[2] + dz
                if 0 <= ix < xdim and 0 <= iy < ydim and 0 <= iz < zdim:
                    v = float(vol[iz, iy, ix])
                else:
                    v = 0.0  # transparent-black border
                wt = ((w[0] if dx else 1 - w[0])
                      * (w[1] if dy else 1 - w[1])
                      * (w[2] if dz else 1 - w[2]))
                total += v * wt
    return total


def sample1d_edge(table, t):
    """texture(u_transfer_func, t) — linear filter, clamp-to-edge."""
    n = table.shape[0]
    x = float(t) * n - 0.5
    i0 = int(np.floor(x))
    w = x - i0
    lo = min(max(i0, 0), n - 1)
    hi = min(max(i0 + 1, 0), n - 1)
    return table[lo] * (1 - w) + table[hi] * w


# -- the fragment shader -----------------------------------------------------

def ref_render(
    vol,
    tf_table,
    camera: RefCamera,
    height,
    width,
    *,
    step_size=0.005,
    ray_dist=1.8,
    density_min=None,
    density_max=None,
    slice_min=(0.0, 0.0, 0.0),
    slice_max=(1.0, 1.0, 1.0),
):
    """volume.frag transliterated; returns (H, W, 4) float64.

    Misses (rays that never hit the cube / camera inside the cube with
    back-face culling) are (0,0,0,0).
    """
    vol = np.asarray(vol, dtype=np.float64)
    tf_table = np.asarray(tf_table, dtype=np.float64)
    if density_min is None:
        density_min = vol.min()
    if density_max is None:
        density_max = vol.max()
    slice_min = np.asarray(slice_min, dtype=np.float64)
    slice_max = np.asarray(slice_max, dtype=np.float64)

    cam_pos, dirs = ref_rays(camera, height, width)
    origin = cam_pos + 0.5  # texture space
    steps = int(ray_dist / step_size)

    out = np.zeros((height, width, 4))
    for i in range(height):
        for j in range(width):
            d = dirs[i, j]
            # slab test: entry point on the cube surface (rasterized front
            # face equivalent); miss (or camera inside, t_entry < 0) -> no
            # fragment.
            with np.errstate(divide="ignore"):
                inv = 1.0 / d
            t0 = (0.0 - origin) * inv
            t1 = (1.0 - origin) * inv
            t_entry = np.minimum(t0, t1).max()
            t_exit = np.maximum(t0, t1).min()
            if t_entry > t_exit or t_entry < 0:
                continue

            # The exact entry point lies ON the cube surface (the shader's
            # rasterized front-face fragment); rounding can land it epsilon
            # outside (falsely triggering the bounds break at step 0) or
            # exactly on a face (falsely failing the strict slicing test).
            # Clamp strictly inside; both marchers use the same epsilon.
            ray_pos = np.clip(origin + t_entry * d, 1e-6, 1.0 - 1e-6)
            color = np.array([0.0, 0.0, 0.0, 1.0])
            for k in range(steps):
                if np.any(ray_pos > 1.0) or np.any(ray_pos < 0.0):
                    break
                if np.all(ray_pos < slice_max) and np.all(ray_pos > slice_min):
                    density = sample3d_border(vol, ray_pos)
                    t = (density - density_min) / (density_max - density_min)
                    s = sample1d_edge(tf_table, t)
                    color[:3] += color[3] * (s[3] * s[:3])
                    color[3] *= 1.0 - s[3]
                ray_pos = ray_pos + d * step_size
            color[3] = 1.0 - color[3]
            out[i, j] = color
    return out
