"""Camera math: pinhole/OpenCV/fisheye models, rays, frustums, camera paths.

Reference: nr3d_lib/graphics/cameras/ (pinhole.py:50-205 lift/get_rays/
frustum; opencv.py:22 + fisheye.py:21-60 distortion; common.py:84-146
frustum culling; normalize_views.py:23,83; camera_paths.py:50-352).

Convention: OpenCV camera frame (x right, y down, z forward); world pose
c2w [..., 3 or 4, 4].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pinhole_lift", "pinhole_project", "pinhole_get_rays",
    "opencv_distort", "opencv_undistort", "fisheye_distort",
    "pixel_grid", "frustum_culling_aabb",
    "normalize_views", "look_at", "spherical_camera_path", "interp_poses",
]

Array = jax.Array


# ------------------------------------------------------------------- pinhole
def pixel_grid(h: int, w: int, dtype=jnp.float32) -> Array:
    """[h, w, 2] pixel-center coordinates (x, y)."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype) + 0.5,
                          jnp.arange(w, dtype=dtype) + 0.5, indexing="ij")
    return jnp.stack([xs, ys], -1)


def pinhole_lift(uv: Array, intr: Array, depth: Optional[Array] = None) -> Array:
    """Pixels → camera-space points (reference pinhole.py lift).

    uv: [...,2]; intr: [...,3,3]; depth: [...] (default 1).
    """
    fx = intr[..., 0, 0]
    fy = intr[..., 1, 1]
    cx = intr[..., 0, 2]
    cy = intr[..., 1, 2]
    sk = intr[..., 0, 1]
    z = jnp.ones_like(uv[..., 0]) if depth is None else depth
    y = (uv[..., 1] - cy) / fy * z
    x = (uv[..., 0] - cx - sk * (uv[..., 1] - cy) / fy) / fx * z
    return jnp.stack([x, y, z], -1)


def pinhole_project(x_cam: Array, intr: Array) -> Tuple[Array, Array]:
    """Camera-space points → (uv [...,2], depth) (reference pinhole.py proj)."""
    z = x_cam[..., 2]
    u = x_cam[..., 0] / z * intr[..., 0, 0] + intr[..., 0, 2]
    v = x_cam[..., 1] / z * intr[..., 1, 1] + intr[..., 1, 2]
    return jnp.stack([u, v], -1), z


def pinhole_get_rays(uv: Array, intr: Array, c2w: Array,
                     normalize: bool = True) -> Tuple[Array, Array]:
    """Pixels + pose → world rays (reference pinhole.py get_rays)."""
    dirs_cam = pinhole_lift(uv, intr)
    r = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    dirs = jnp.einsum("...ij,...j->...i", r, dirs_cam)
    if normalize:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    o = jnp.broadcast_to(t, dirs.shape)
    return o, dirs


# ---------------------------------------------------------------- distortion
def opencv_distort(xn: Array, dist: Array) -> Array:
    """Normalized cam coords [...,2] → distorted, OpenCV model k1..k6,p1,p2
    (reference opencv.py:22). dist: [...,≥4] = (k1,k2,p1,p2[,k3,k4,k5,k6])."""
    def get(i):
        return dist[..., i] if dist.shape[-1] > i else jnp.zeros_like(dist[..., 0])

    k1, k2, p1, p2 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
    k3, k4, k5, k6 = get(4), get(5), get(6), get(7)
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = (1 + r2 * (k1 + r2 * (k2 + r2 * k3))) / \
             (1 + r2 * (k4 + r2 * (k5 + r2 * k6)))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], -1)


def opencv_undistort(xd: Array, dist: Array, iters: int = 8) -> Array:
    """Fixed-point inversion of opencv_distort (reference iterative undistort)."""
    dist = jnp.asarray(dist, xd.dtype)

    def body(i, xn):
        d = opencv_distort(xn, dist) - xn
        return (xd - d).astype(xd.dtype)

    return jax.lax.fori_loop(0, iters, body, xd)


def fisheye_distort(xn: Array, dist: Array) -> Array:
    """Equidistant fisheye (reference fisheye.py:21-60): θ-polynomial."""
    x, y = xn[..., 0], xn[..., 1]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan(r)
    t2 = theta * theta
    k1, k2, k3, k4 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
    theta_d = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = jnp.where(r > 1e-8, theta_d / jnp.maximum(r, 1e-8), 1.0)
    return jnp.stack([x * scale, y * scale], -1)


# ----------------------------------------------------------------- frustums
def frustum_culling_aabb(intr: Array, c2w: Array, hw: Tuple[int, int],
                         aabb: Array, near: float = 0.0, far: float = 100.0
                         ) -> Array:
    """Conservative test: does the camera frustum intersect the AABB?
    (reference common.py:84-146). Checks AABB corners against frustum planes.
    Returns bool (scalar or batched over leading dims)."""
    h, w = hw
    corners = jnp.stack(jnp.meshgrid(aabb[:, 0], aabb[:, 1], aabb[:, 2],
                                     indexing="ij"), -1).reshape(8, 3)
    w2c_r = jnp.swapaxes(c2w[..., :3, :3], -1, -2)
    t = c2w[..., :3, 3]
    cam = jnp.einsum("...ij,kj->...ki", w2c_r, corners - t[..., None, :]
                     if t.ndim == 1 else corners[None] - t[..., None, :])
    if cam.ndim == 2:
        cam = cam
    uv, z = pinhole_project(cam, intr[..., None, :, :] if intr.ndim > 2 else intr)
    in_front = z > near
    behind_far = z < far
    inside_u = (uv[..., 0] > 0) & (uv[..., 0] < w)
    inside_v = (uv[..., 1] > 0) & (uv[..., 1] < h)
    # conservative: any corner projecting inside, or corners straddling
    any_inside = jnp.any(in_front & behind_far & inside_u & inside_v, axis=-1)
    straddle = jnp.any(z > near, -1) & jnp.any(
        (uv[..., 0] < w) & (uv[..., 0] > 0) | True, -1) & (
        jnp.any(uv[..., 0] < w, -1) & jnp.any(uv[..., 0] > 0, -1)
        & jnp.any(uv[..., 1] < h, -1) & jnp.any(uv[..., 1] > 0, -1))
    return any_inside | (straddle & jnp.any(in_front, -1))


# ------------------------------------------------------------ normalization
def normalize_views(c2ws: Array, target_radius: float = 1.0
                    ) -> Tuple[Array, Array, Array]:
    """Recentre+rescale a camera rig so cameras fit a sphere
    (reference normalize_views.py:23,83). Returns (new_c2ws, center, scale)."""
    centers = c2ws[..., :3, 3]
    mid = jnp.mean(centers, axis=0)
    radius = jnp.max(jnp.linalg.norm(centers - mid, axis=-1))
    scale = target_radius / jnp.maximum(radius, 1e-8)
    new = c2ws.at[..., :3, 3].set((centers - mid) * scale)
    return new, mid, scale


# -------------------------------------------------------------- camera paths
def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> Array:
    """c2w [4,4] with OpenCV convention (z forward) (reference camera_paths)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-8)
    down = jnp.cross(fwd, right)
    r = jnp.stack([right, down, fwd], -1)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(r).at[:3, 3].set(eye)


def spherical_camera_path(n_frames: int, radius: float = 3.0,
                          elevation: float = 0.3, center=(0.0, 0.0, 0.0)
                          ) -> Array:
    """Turntable orbit → [n_frames, 4, 4] (reference camera_paths.py:50)."""
    center = jnp.asarray(center, jnp.float32)
    angles = jnp.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    poses = []
    for a in np.asarray(angles):
        eye = center + radius * jnp.asarray(
            [np.cos(a) * np.cos(elevation), np.sin(elevation),
             np.sin(a) * np.cos(elevation)], jnp.float32)
        poses.append(look_at(eye, center))
    return jnp.stack(poses)


def interp_poses(c2w0: Array, c2w1: Array, alpha) -> Array:
    """Pose interpolation: slerp rotation + lerp translation
    (reference camera_paths interpolation)."""
    from nr3d_lib_tpu.maths.transforms import (matrix_to_quaternion,
                                               quaternion_to_matrix)
    from nr3d_lib_tpu.maths.slerp import slerp

    q0 = matrix_to_quaternion(c2w0[:3, :3])
    q1 = matrix_to_quaternion(c2w1[:3, :3])
    q = slerp(q0, q1, alpha)
    r = quaternion_to_matrix(q)
    t = c2w0[:3, 3] * (1 - alpha) + c2w1[:3, 3] * alpha
    m = jnp.eye(4, dtype=c2w0.dtype)
    return m.at[:3, :3].set(r).at[:3, 3].set(t)
