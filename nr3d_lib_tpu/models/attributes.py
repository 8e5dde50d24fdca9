"""Attributes framework: tensor-like scene attributes with batch prefixes.

Reference: nr3d_lib/models/attributes/ — `Attr`/`AttrNested` tensor-like
nn.Modules with slicing/stack/interp and arbitrary batch prefixes
(attr.py:38-247); SO3 variants (Quaternion/AxisAngle/6D/Mat3x3) and SE3
variants (RT/Mat4x4/ExpSE3) sharing `transform/rotate/mat_3x4/mat_4x4/inv/
interp1d` (transform.py:62-385); camera-intrinsics family with a common
lift/proj API (camera_param.py:62-538); `Segment` validity intervals
(segment.py:92).

TPU-native design: attributes are registered pytrees (`flax.struct`
dataclasses) — they slice/stack with jax tree ops, pass through jit
unchanged, and are optimizable (pose refinement) by making them leaves of
the param tree.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import struct

from nr3d_lib_tpu.maths.slerp import slerp
from nr3d_lib_tpu.maths.transforms import (
    axis_angle_to_quaternion, matrix_to_quaternion, quaternion_to_matrix,
    rotation_6d_to_matrix)

__all__ = [
    "RotationQuaternion", "RotationAxisAngle", "Rotation6D", "RotationMat3x3",
    "TransformRT", "TransformMat4x4", "Scale",
    "PinholeCameraIntrinsics", "OpenCVCameraIntrinsics",
    "FisheyeCameraIntrinsics", "OrthoCameraIntrinsics", "Segment",
]

Array = jax.Array


# ------------------------------------------------------------------ SO3 reps
class _RotBase:
    def mat_3x3(self) -> Array:
        raise NotImplementedError

    def rotate(self, v: Array) -> Array:
        return jnp.einsum("...ij,...j->...i", self.mat_3x3(), v)

    def inv_rotate(self, v: Array) -> Array:
        return jnp.einsum("...ji,...j->...i", self.mat_3x3(), v)


@struct.dataclass
class RotationQuaternion(_RotBase):
    q: Array  # [..., 4] (w,x,y,z)

    def mat_3x3(self) -> Array:
        return quaternion_to_matrix(self.q)

    def interp1d(self, other: "RotationQuaternion", alpha) -> "RotationQuaternion":
        return RotationQuaternion(slerp(self.q, other.q, alpha))

    @classmethod
    def from_matrix(cls, m: Array):
        return cls(matrix_to_quaternion(m))


@struct.dataclass
class RotationAxisAngle(_RotBase):
    aa: Array  # [..., 3]

    def mat_3x3(self) -> Array:
        return quaternion_to_matrix(axis_angle_to_quaternion(self.aa))


@struct.dataclass
class Rotation6D(_RotBase):
    d6: Array  # [..., 6]

    def mat_3x3(self) -> Array:
        return rotation_6d_to_matrix(self.d6)


@struct.dataclass
class RotationMat3x3(_RotBase):
    m: Array  # [..., 3, 3]

    def mat_3x3(self) -> Array:
        return self.m


# ------------------------------------------------------------------ SE3 reps
class _TransformBase:
    def mat_4x4(self) -> Array:
        m34 = self.mat_3x4()
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], m34.dtype),
            m34.shape[:-2] + (1, 4))
        return jnp.concatenate([m34, bottom], axis=-2)

    def transform(self, pts: Array) -> Array:
        m = self.mat_3x4()
        return jnp.einsum("...ij,...j->...i", m[..., :3], pts) + m[..., 3]

    def rotate(self, v: Array) -> Array:
        return jnp.einsum("...ij,...j->...i", self.mat_3x4()[..., :3], v)


@struct.dataclass
class TransformRT(_TransformBase):
    """rotation (quaternion) + translation (reference transform.py RT)."""

    rot: Array    # [..., 4] quaternion
    trans: Array  # [..., 3]

    def mat_3x4(self) -> Array:
        r = quaternion_to_matrix(self.rot)
        return jnp.concatenate([r, self.trans[..., None]], -1)

    def inv(self) -> "TransformRT":
        r_inv = self.rot * jnp.asarray([1.0, -1, -1, -1], self.rot.dtype)
        t_inv = -jnp.einsum("...ji,...j->...i",
                            quaternion_to_matrix(self.rot), self.trans)
        return TransformRT(r_inv, t_inv)

    def interp1d(self, other: "TransformRT", alpha) -> "TransformRT":
        """slerp rotation + lerp translation (reference interp1d)."""
        return TransformRT(slerp(self.rot, other.rot, alpha),
                           self.trans * (1 - alpha) + other.trans * alpha)

    @classmethod
    def from_mat4x4(cls, m: Array):
        return cls(matrix_to_quaternion(m[..., :3, :3]), m[..., :3, 3])


@struct.dataclass
class TransformMat4x4(_TransformBase):
    m: Array  # [..., 4, 4]

    def mat_3x4(self) -> Array:
        return self.m[..., :3, :]

    def mat_4x4(self) -> Array:
        return self.m

    def inv(self) -> "TransformMat4x4":
        r = self.m[..., :3, :3]
        t = self.m[..., :3, 3]
        r_t = jnp.swapaxes(r, -1, -2)
        t_inv = -jnp.einsum("...ij,...j->...i", r_t, t)
        top = jnp.concatenate([r_t, t_inv[..., None]], -1)
        bottom = jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1], self.m.dtype),
                                  self.m.shape[:-2] + (1, 4))
        return TransformMat4x4(jnp.concatenate([top, bottom], -2))


@struct.dataclass
class Scale:
    """Per-axis scale attr (reference attr scale family)."""

    s: Array  # [..., 3]

    def ratio3d(self) -> Array:
        return self.s

    def apply(self, pts: Array) -> Array:
        return pts * self.s


# ---------------------------------------------------------------- intrinsics
class _IntrBase:
    def mat_3x3(self) -> Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx], -1),
            jnp.stack([z, self.fy, self.cy], -1),
            jnp.stack([z, z, o], -1)], -2)

    def lift(self, uv: Array, depth: Optional[Array] = None) -> Array:
        from nr3d_lib_tpu.graphics.cameras import pinhole_lift

        return pinhole_lift(uv, self.mat_3x3(), depth)

    def proj(self, x_cam: Array) -> Tuple[Array, Array]:
        from nr3d_lib_tpu.graphics.cameras import pinhole_project

        return pinhole_project(x_cam, self.mat_3x3())


@struct.dataclass
class PinholeCameraIntrinsics(_IntrBase):
    """(fx, fy, cx, cy) + image size (reference camera_param.py Pinhole)."""

    fx: Array
    fy: Array
    cx: Array
    cy: Array
    H: int = struct.field(pytree_node=False, default=0)
    W: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def from_mat(cls, mat: Array, H: int = 0, W: int = 0):
        return cls(mat[..., 0, 0], mat[..., 1, 1], mat[..., 0, 2],
                   mat[..., 1, 2], H, W)

    def downscale(self, factor: float) -> "PinholeCameraIntrinsics":
        f = 1.0 / factor
        return PinholeCameraIntrinsics(self.fx * f, self.fy * f,
                                       self.cx * f, self.cy * f,
                                       int(self.H // factor), int(self.W // factor))


@struct.dataclass
class OpenCVCameraIntrinsics(PinholeCameraIntrinsics):
    """Pinhole + OpenCV distortion (reference camera_param.py OpenCV)."""

    dist: Array = None  # [..., >=4]

    def proj(self, x_cam: Array) -> Tuple[Array, Array]:
        from nr3d_lib_tpu.graphics.cameras import opencv_distort

        z = x_cam[..., 2]
        xn = x_cam[..., :2] / z[..., None]
        xd = opencv_distort(xn, self.dist)
        u = xd[..., 0] * self.fx + self.cx
        v = xd[..., 1] * self.fy + self.cy
        return jnp.stack([u, v], -1), z

    def lift(self, uv: Array, depth: Optional[Array] = None) -> Array:
        from nr3d_lib_tpu.graphics.cameras import opencv_undistort

        xd = jnp.stack([(uv[..., 0] - self.cx) / self.fx,
                        (uv[..., 1] - self.cy) / self.fy], -1)
        xn = opencv_undistort(xd, self.dist)
        z = jnp.ones_like(uv[..., 0]) if depth is None else depth
        return jnp.concatenate([xn * z[..., None], z[..., None]], -1)


@struct.dataclass
class FisheyeCameraIntrinsics(PinholeCameraIntrinsics):
    """Pinhole + equidistant fisheye (reference camera_param.py Fisheye)."""

    dist: Array = None  # [..., 4]

    def proj(self, x_cam: Array) -> Tuple[Array, Array]:
        from nr3d_lib_tpu.graphics.cameras import fisheye_distort

        z = x_cam[..., 2]
        xn = x_cam[..., :2] / z[..., None]
        xd = fisheye_distort(xn, self.dist)
        u = xd[..., 0] * self.fx + self.cx
        v = xd[..., 1] * self.fy + self.cy
        return jnp.stack([u, v], -1), z


@struct.dataclass
class OrthoCameraIntrinsics(_IntrBase):
    """Orthographic (reference camera_param.py Ortho)."""

    sx: Array
    sy: Array
    cx: Array
    cy: Array
    H: int = struct.field(pytree_node=False, default=0)
    W: int = struct.field(pytree_node=False, default=0)

    def lift(self, uv: Array, depth: Optional[Array] = None) -> Array:
        z = jnp.ones_like(uv[..., 0]) if depth is None else depth
        x = (uv[..., 0] - self.cx) / self.sx
        y = (uv[..., 1] - self.cy) / self.sy
        return jnp.stack([x, y, z], -1)

    def proj(self, x_cam: Array) -> Tuple[Array, Array]:
        u = x_cam[..., 0] * self.sx + self.cx
        v = x_cam[..., 1] * self.sy + self.cy
        return jnp.stack([u, v], -1), x_cam[..., 2]


# ------------------------------------------------------------------ segment
@struct.dataclass
class Segment:
    """Validity interval per entity (reference segment.py:92): an entity
    exists for frame indices in [start, stop)."""

    start: Array  # [...]
    stop: Array   # [...]

    def valid(self, t: Array) -> Array:
        return (t >= self.start) & (t < self.stop)

    def length(self) -> Array:
        return self.stop - self.start
