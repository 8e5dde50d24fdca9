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


def fisheye_undistort(xd: Array, dist: Array, iters: int = 10) -> Array:
    """Inverse of `fisheye_distort` (reference fisheye.py undistortion):
    Newton-solve θ from θ_d = θ·(1 + k1·θ² + ...), then r = tan θ.

    Fixed iteration count → jit-static; converges in <10 iters for any
    physical lens (|θ| < π/2)."""
    dist = jnp.asarray(dist, xd.dtype)
    k1, k2, k3, k4 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
    r_d = jnp.linalg.norm(xd, axis=-1)
    theta_d = r_d

    def body(i, theta):
        t2 = theta * theta
        f = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - theta_d
        fp = (1 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4))))
        return theta - f / jnp.where(jnp.abs(fp) > 1e-6, fp,
                                     jnp.sign(fp) * 1e-6 + 1e-12)

    theta = jax.lax.fori_loop(0, iters, body, theta_d)
    scale = jnp.where(r_d > 1e-8, jnp.tan(theta) / jnp.maximum(r_d, 1e-8), 1.0)
    return xd * scale[..., None]


# ----------------------------------------------------------------- frustums
def frustum_culling_aabb(intr: Array, c2w: Array, hw: Tuple[int, int],
                         aabb: Array, near: float = 1e-3, far: float = 100.0
                         ) -> Array:
    """Conservative frustum↔AABB intersection (reference common.py:84-146).

    Two-way plane test (the standard SAT-lite): the boxes are disjoint if
    all 8 AABB corners lie outside one frustum half-space, OR all 8 frustum
    corners lie outside one AABB face. Never culls a visible box; rare
    near-miss false positives are acceptable for its use (skipping chunks).
    c2w [..., 4, 4] may be batched; returns bool [...]."""
    h, w = hw
    box = jnp.stack(jnp.meshgrid(aabb[:, 0], aabb[:, 1], aabb[:, 2],
                                 indexing="ij"), -1).reshape(8, 3)   # [8,3]
    r_c2w = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    # AABB corners in camera space
    cam = jnp.einsum("...ji,...kj->...ki", r_c2w, box - t[..., None, :])
    fx, fy = intr[..., 0, 0], intr[..., 1, 1]
    cx, cy = intr[..., 0, 2], intr[..., 1, 2]
    x, y, z = cam[..., 0], cam[..., 1], cam[..., 2]
    # frustum half-space tests on AABB corners (all-outside-one-plane culls)
    out = jnp.stack([
        jnp.all(z < near, -1), jnp.all(z > far, -1),
        # u = fx·x/z + cx < 0  ⇔  fx·x + cx·z < 0 for z>0 (sign-safe form)
        jnp.all(fx[..., None] * x + cx[..., None] * z < 0, -1),
        jnp.all(fx[..., None] * x + (cx[..., None] - w) * z > 0, -1),
        jnp.all(fy[..., None] * y + cy[..., None] * z < 0, -1),
        jnp.all(fy[..., None] * y + (cy[..., None] - h) * z > 0, -1)], -1)
    frustum_rejects = jnp.any(out, -1)

    # frustum corners in world space vs AABB faces
    us = jnp.asarray([0.0, float(w)])
    vs = jnp.asarray([0.0, float(h)])
    uu, vv, dd = jnp.meshgrid(us, vs, jnp.asarray([near, far]), indexing="ij")
    xc = (uu - cx[..., None, None, None]) / fx[..., None, None, None] * dd
    yc = (vv - cy[..., None, None, None]) / fy[..., None, None, None] * dd
    fc_cam = jnp.stack([xc, yc, jnp.broadcast_to(dd, xc.shape)], -1)
    fc_cam = fc_cam.reshape(fc_cam.shape[:-4] + (8, 3))
    fc_w = jnp.einsum("...ij,...kj->...ki", r_c2w, fc_cam) + t[..., None, :]
    box_rejects = jnp.any(jnp.concatenate([
        jnp.all(fc_w < aabb[None, 0], -2),
        jnp.all(fc_w > aabb[None, 1], -2)], -1), -1)
    return ~(frustum_rejects | box_rejects)


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


def smoothed_motion_interpolation(full_range: float, n: int,
                                  uniform_proportion: float = 1.0 / 3.0
                                  ) -> np.ndarray:
    """Ease-in/ease-out sample spacing over [0, full_range]: sine-smoothed
    ends, uniform middle (reference camera_paths.py:31)."""
    u = np.linspace(0.0, np.pi, n)
    eased = (1.0 - np.cos(u)) * 0.5                    # smooth 0→1
    lin = np.linspace(0.0, 1.0, n)
    w = float(np.clip(uniform_proportion, 0.0, 1.0))
    return full_range * (w * lin + (1.0 - w) * eased)


def _circle_basis(three_cam_centers: np.ndarray):
    """Shared small-circle geometry: snapped centers, radius, plane normal
    (reference camera_paths.py:50-70,162-180)."""
    c = np.asarray(three_cam_centers, np.float64)
    norms = np.linalg.norm(c, axis=-1)
    radius = float(norms.max())
    c = c * radius / norms[:, None]
    up = np.cross(c[1] - c[0], c[2] - c[0])
    up = up / max(np.linalg.norm(up), 1e-12)
    return c, radius, up


def path_small_circle(three_cam_centers, n_frames: int) -> Array:
    """Sweep along the arc through three reference views, origin-focused,
    ease-in/out pacing (reference camera_paths.py:162 get_path_small_circle)."""
    from nr3d_lib_tpu.maths.transforms import axis_angle_to_matrix

    c, radius, up = _circle_basis(three_cam_centers)
    chord = np.linalg.norm(c[2] - c[0])
    full_angle = 2.0 * np.arcsin(min(chord / (2.0 * radius), 1.0))
    angles = smoothed_motion_interpolation(full_angle, n_frames)
    poses = []
    for a in angles:
        r = np.asarray(axis_angle_to_matrix(jnp.asarray(up * a, jnp.float32)))
        eye = r @ c[0]
        poses.append(look_at(eye, jnp.zeros(3), up=jnp.asarray(up, jnp.float32)))
    return jnp.stack(poses)


def path_spherical_spiral(three_cam_centers, n_frames: int,
                          n_rots: float = 2.2,
                          up_angle_start: float = 0.0,
                          up_angle: float = np.pi / 3.0) -> Array:
    """Spherical spiral rising from the reference small circle toward its
    pole, always focusing the origin (reference camera_paths.py:50
    get_path_spherical_spiral)."""
    c, radius, up = _circle_basis(three_cam_centers)
    # orthonormal frame of the circle plane
    e0 = c[0] / np.linalg.norm(c[0])
    e0 = e0 - up * np.dot(up, e0)
    e0 = e0 / max(np.linalg.norm(e0), 1e-12)
    e1 = np.cross(up, e0)
    thetas = np.linspace(0.0, 2.0 * np.pi * n_rots, n_frames)
    phis = np.linspace(up_angle_start, up_angle, n_frames)
    poses = []
    for th, ph in zip(thetas, phis):
        eye = radius * (np.cos(ph) * (np.cos(th) * e0 + np.sin(th) * e1)
                        + np.sin(ph) * up)
        poses.append(look_at(jnp.asarray(eye, jnp.float32), jnp.zeros(3),
                             up=jnp.asarray(up, jnp.float32)))
    return jnp.stack(poses)


def path_interpolation(key_poses, n_frames: int) -> Array:
    """Resample a key-pose trajectory [N,4,4] to n_frames: per-segment
    slerp rotation + lerp translation (reference camera_paths.py:352
    get_path_interpolation — scipy Slerp/interp1d replaced by our own)."""
    key_poses = jnp.asarray(key_poses).reshape(-1, 4, 4)
    n_keys = key_poses.shape[0]
    times = np.linspace(0.0, n_keys - 1.0, n_frames)
    poses = []
    for t in times:
        i = min(int(np.floor(t)), n_keys - 2)
        poses.append(interp_poses(key_poses[i], key_poses[i + 1],
                                  float(t - i)))
    return jnp.stack(poses)
