"""GEM occupancy losses + gated perceptual losses.

Reference: nr3d_lib/models/loss/GEM.py:21,95 (generalized energy-based mask
losses used for occupancy supervision) and clip.py (CLIP feature loss —
gated here: pretrained weights are unavailable in zero-egress environments).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["gem_density_reg", "gem_opacity_loss", "clip_loss"]

Array = jax.Array


def gem_density_reg(sigma: Array, lamb: float = 0.05) -> Array:
    """Cauchy-style density sparsity (GEM.py energy regularizer):
    mean log(1 + σ²/λ)."""
    return jnp.mean(jnp.log1p(sigma ** 2 / lamb))


def gem_opacity_loss(acc: Array, mask_gt: Optional[Array] = None,
                     eps: float = 1e-5) -> Array:
    """Binary-entropy opacity loss (GEM.py:95): without GT, pushes per-ray
    opacity toward 0/1; with GT, a safe BCE against the mask."""
    a = jnp.clip(acc, eps, 1.0 - eps)
    if mask_gt is None:
        return jnp.mean(-(a * jnp.log(a) + (1 - a) * jnp.log(1 - a)))
    m = mask_gt.astype(a.dtype)
    return jnp.mean(-(m * jnp.log(a) + (1 - m) * jnp.log(1 - a)))


def clip_loss(*args, **kwargs):
    raise ImportError(
        "CLIP loss requires pretrained CLIP weights (torch + downloaded "
        "checkpoints), unavailable in zero-egress environments. Reference: "
        "nr3d_lib/models/loss/clip.py.")
