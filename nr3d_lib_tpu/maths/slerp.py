"""Quaternion slerp (reference: nr3d_lib/maths/slerp.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["slerp"]


def slerp(q0, q1, t):
    """Spherical interpolation of unit quaternions (w,x,y,z); t ∈ [0,1]."""
    q0 = q0 / jnp.linalg.norm(q0, axis=-1, keepdims=True)
    q1 = q1 / jnp.linalg.norm(q1, axis=-1, keepdims=True)
    dot = jnp.sum(q0 * q1, -1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)  # shortest arc
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    t = jnp.asarray(t)
    t = t[..., None] if jnp.ndim(t) == jnp.ndim(q0) - 1 else t
    near = sin_t < 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_t))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_t))
    out = w0 * q0 + w1 * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
