"""Image metrics: PSNR / SSIM (+optional torch-LPIPS).

Reference: nr3d_lib/graphics/utils.py:55-141 (PSNR/SSIM/LPIPS) + sRGB
conversions. LPIPS needs pretrained torch weights — gated, raises a clear
error if the weights are unavailable (zero-egress environment).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nr3d_lib_tpu.models.loss.ssim import ssim  # noqa: F401  (re-export)

__all__ = ["psnr", "ssim", "lpips", "linear_to_srgb", "srgb_to_linear"]


def psnr(pred, gt, max_val: float = 1.0, mask=None) -> jnp.ndarray:
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    if mask is not None:
        m = jnp.broadcast_to(mask.astype(jnp.float32).reshape(
            mask.shape + (1,) * (pred.ndim - mask.ndim)), pred.shape)
        mse = jnp.sum((pred - gt) ** 2 * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def lpips(pred, gt, net: str = "vgg"):
    """Perceptual distance via torch lpips, if importable with weights."""
    try:
        import torch
        import lpips as _lpips_mod  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "LPIPS needs the `lpips` torch package with pretrained weights "
            "(unavailable in zero-egress environments)") from e
    model = _lpips_mod.LPIPS(net=net)
    a = torch.from_numpy(np.asarray(pred, np.float32)).permute(2, 0, 1)[None] * 2 - 1
    b = torch.from_numpy(np.asarray(gt, np.float32)).permute(2, 0, 1)[None] * 2 - 1
    with torch.no_grad():
        return float(model(a, b))


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x,
                     1.055 * jnp.power(jnp.maximum(x, 1e-8), 1 / 2.4) - 0.055)


def srgb_to_linear(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.04045, x / 12.92,
                     jnp.power((x + 0.055) / 1.055, 2.4))
