"""Coordinate-convention conversions (reference: nr3d_lib/coordinates/
conversion.py:1-60 — documented opencv/opengl/carla/waymo frame swaps).

All functions map camera-to-world (c2w) pose matrices or direction vectors
between conventions. Conventions (right-handed unless noted):

  opencv : x right, y down,  z forward   (the library's native convention)
  opengl : x right, y up,    z backward
  carla  : x forward, y right, z up (left-handed, UE4)
  waymo  : x forward, y left,  z up
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["opengl_to_opencv", "opencv_to_opengl", "waymo_to_opencv",
           "opencv_to_waymo", "convert_pose"]

# change-of-basis: columns express the source frame's axes in target coords
_M = {
    ("opengl", "opencv"): np.diag([1.0, -1.0, -1.0]),
    ("opencv", "opengl"): np.diag([1.0, -1.0, -1.0]),
    # waymo (x fwd, y left, z up) → opencv (x right, y down, z fwd):
    # x_cv = -y_w, y_cv = -z_w, z_cv = x_w
    ("waymo", "opencv"): np.asarray([[0.0, -1.0, 0.0],
                                     [0.0, 0.0, -1.0],
                                     [1.0, 0.0, 0.0]]),
    ("opencv", "waymo"): np.asarray([[0.0, 0.0, 1.0],
                                     [-1.0, 0.0, 0.0],
                                     [0.0, -1.0, 0.0]]),
}


def convert_pose(c2w, src: str, dst: str):
    """Re-express a camera pose whose CAMERA axes follow `src` so the camera
    axes follow `dst` (world frame unchanged): R' = R @ M_dst←src."""
    if src == dst:
        return c2w
    m = jnp.asarray(_M[(dst, src)] if (dst, src) in _M else
                    np.linalg.inv(_M[(src, dst)]))
    c2w = jnp.asarray(c2w)
    out = c2w.at[..., :3, :3].set(c2w[..., :3, :3] @ m.T)
    return out


def opengl_to_opencv(c2w):
    return convert_pose(c2w, "opengl", "opencv")


def opencv_to_opengl(c2w):
    return convert_pose(c2w, "opencv", "opengl")


def waymo_to_opencv(c2w):
    return convert_pose(c2w, "waymo", "opencv")


def opencv_to_waymo(c2w):
    return convert_pose(c2w, "opencv", "waymo")
