"""NeRF volume-render math: density → alpha → visibility weights.

Reference: nr3d_lib/graphics/nerf/nerf_utils.py:23-129. Both dense per-ray
[R, S] ("ray_") and flat packed ("packed_") layouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nr3d_lib_tpu.graphics import pack_ops as po

__all__ = ["tau_to_alpha", "ray_alpha_to_vw", "ray_tau_to_vw",
           "packed_alpha_to_vw", "packed_tau_to_vw", "ray_composite"]

Array = jax.Array


def tau_to_alpha(tau: Array) -> Array:
    """Optical depth per interval → opacity (reference nerf_utils.py:23)."""
    return 1.0 - jnp.exp(-tau)


def ray_alpha_to_vw(alpha: Array) -> Array:
    """[..., S] α → visibility weights via exclusive transmittance
    (reference nerf_utils.py ray_alpha_to_vw)."""
    one_m = jnp.clip(1.0 - alpha, 0.0, 1.0)
    trans = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(one_m[..., :1]), one_m[..., :-1]], -1), -1)
    return alpha * trans


def ray_tau_to_vw(tau: Array) -> Array:
    alpha = tau_to_alpha(tau)
    t_excl = jnp.cumsum(tau, -1) - tau
    return alpha * jnp.exp(-t_excl)


# packed layouts delegate to pack_ops
packed_alpha_to_vw = po.packed_alpha_to_vw
packed_tau_to_vw = po.packed_tau_to_vw


def ray_composite(vw: Array, values: Array, depth_t: Array = None):
    """Composite per-sample values with visibility weights.

    vw [R,S]; values [R,S,C]; returns dict(rgb/mask/depth) mirroring the
    reference's rendered buffers (renderer_mixin.py:398-440).
    """
    out = {"rgb": jnp.sum(vw[..., None] * values, -2),
           "mask_volume": jnp.sum(vw, -1)}
    if depth_t is not None:
        acc = jnp.maximum(out["mask_volume"], 1e-10)
        out["depth_volume"] = jnp.sum(vw * depth_t, -1) / acc
    return out
