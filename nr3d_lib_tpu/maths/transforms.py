"""Rotation representations: quaternion / axis-angle / 6D / matrix.

Reference: nr3d_lib/maths/transforms.py:41-508 (pytorch3d-derived
conversions). Conventions: quaternions (w, x, y, z), unit norm; matrices
act on column vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quaternion_to_matrix", "matrix_to_quaternion",
    "axis_angle_to_matrix", "matrix_to_axis_angle",
    "axis_angle_to_quaternion", "quaternion_to_axis_angle",
    "rotation_6d_to_matrix", "matrix_to_rotation_6d",
    "quaternion_multiply", "quaternion_invert", "quaternion_apply",
]

Array = jax.Array


def quaternion_to_matrix(q: Array) -> Array:
    """(w,x,y,z) [...,4] → [...,3,3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = 2.0
    m = jnp.stack([
        1 - two * (y * y + z * z), two * (x * y - z * w), two * (x * z + y * w),
        two * (x * y + z * w), 1 - two * (x * x + z * z), two * (y * z - x * w),
        two * (x * z - y * w), two * (y * z + x * w), 1 - two * (x * x + y * y),
    ], -1)
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: Array) -> Array:
    """[...,3,3] → (w,x,y,z); branch-free Shepperd-style selection."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = safe_sqrt(1 + tr) / 2
    qx = safe_sqrt(1 + m00 - m11 - m22) / 2
    qy = safe_sqrt(1 - m00 + m11 - m22) / 2
    qz = safe_sqrt(1 - m00 - m11 + m22) / 2
    # four candidate quats (one per dominant component), signs from off-diags
    c0 = jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw),
                    (m10 - m01) / (4 * qw)], -1)
    c1 = jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx),
                    (m02 + m20) / (4 * qx)], -1)
    c2 = jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy,
                    (m12 + m21) / (4 * qy)], -1)
    c3 = jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz),
                    (m12 + m21) / (4 * qz), qz], -1)
    comp = jnp.stack([qw, qx, qy, qz], -1)
    best = jnp.argmax(comp, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], -2)                      # [...,4,4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), -2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def axis_angle_to_quaternion(aa: Array) -> Array:
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = angle * 0.5
    small = angle < 1e-6
    sin_ratio = jnp.where(small, 0.5 - angle ** 2 / 48,
                          jnp.sin(half) / jnp.maximum(angle, 1e-12))
    return jnp.concatenate([jnp.cos(half), aa * sin_ratio], -1)


def quaternion_to_axis_angle(q: Array) -> Array:
    q = q * jnp.sign(q[..., :1] + 1e-12)  # w >= 0 branch
    norm_v = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm_v, q[..., :1])
    small = norm_v < 1e-6
    scale = jnp.where(small, 2.0, angle / jnp.maximum(norm_v, 1e-12))
    return q[..., 1:] * scale


def axis_angle_to_matrix(aa: Array) -> Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(aa))


def matrix_to_axis_angle(m: Array) -> Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(m))


def rotation_6d_to_matrix(d6: Array) -> Array:
    """Zhou et al. 6D → matrix via Gram-Schmidt (reference transforms.py)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], -2)


def matrix_to_rotation_6d(m: Array) -> Array:
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def quaternion_multiply(a: Array, b: Array) -> Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def quaternion_invert(q: Array) -> Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quaternion_apply(q: Array, pts: Array) -> Array:
    p = jnp.concatenate([jnp.zeros_like(pts[..., :1]), pts], -1)
    out = quaternion_multiply(quaternion_multiply(q, p), quaternion_invert(q))
    return out[..., 1:]
