"""Geometry/volume regularizers used by the field trainers.

eikonal (reference: used via fields/sdf + lotd training), normal smoothness,
ray-entropy and mip-nerf-360 distortion losses (the reference bundles
equivalents in downstream trainers; provided here as framework citizens).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["eikonal_loss", "normal_smoothness_loss", "entropy_regularization",
           "distortion_loss"]

Array = jax.Array


def eikonal_loss(nablas: Array, mask: Optional[Array] = None) -> Array:
    """E[(‖∇sdf‖-1)²] — drives the SDF toward unit gradient."""
    n = jnp.linalg.norm(nablas, axis=-1)
    loss = (n - 1.0) ** 2
    if mask is not None:
        m = mask.astype(loss.dtype)
        return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(loss)


def normal_smoothness_loss(nablas: Array, nablas_perturbed: Array,
                           mask: Optional[Array] = None) -> Array:
    """‖n(x) − n(x+ε)‖² on normalized normals (permuto-sdf style)."""
    n0 = nablas / jnp.maximum(jnp.linalg.norm(nablas, axis=-1, keepdims=True), 1e-8)
    n1 = nablas_perturbed / jnp.maximum(
        jnp.linalg.norm(nablas_perturbed, axis=-1, keepdims=True), 1e-8)
    loss = jnp.sum((n0 - n1) ** 2, -1)
    if mask is not None:
        m = mask.astype(loss.dtype)
        return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(loss)


def entropy_regularization(vw: Array, eps: float = 1e-6) -> Array:
    """Ray opacity entropy: pushes per-sample weights to be peaky."""
    p = vw / jnp.maximum(jnp.sum(vw, -1, keepdims=True), eps)
    return -jnp.mean(jnp.sum(p * jnp.log(p + eps), -1))


def distortion_loss(t: Array, vw: Array) -> Array:
    """mip-NeRF-360 distortion: Σᵢⱼ wᵢwⱼ|tᵢ−tⱼ| + ⅓Σᵢwᵢ²Δᵢ (dense [R,S])."""
    mid = t
    cross = jnp.abs(mid[..., :, None] - mid[..., None, :])
    w_outer = vw[..., :, None] * vw[..., None, :]
    loss_cross = jnp.sum(w_outer * cross, (-1, -2))
    dt = jnp.concatenate([t[..., 1:] - t[..., :-1],
                          jnp.zeros_like(t[..., :1])], -1)
    loss_self = jnp.sum(vw ** 2 * dt, -1) / 3.0
    return jnp.mean(loss_cross + loss_self)
