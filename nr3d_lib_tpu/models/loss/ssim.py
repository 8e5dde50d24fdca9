"""SSIM (reference: nr3d_lib/models/loss/ssim.py) — gaussian-window SSIM in
pure JAX (differentiable; doubles as the SSIM metric, replacing skimage)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ssim"]


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter2d(img, kern1d):
    """Separable 2D filter over the leading two axes of [H,W,C]."""
    k = jnp.asarray(kern1d)
    pad = len(kern1d) // 2
    img_p = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for i in range(len(kern1d)):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(img_p, i, img.shape[0], 0)
    img_p = jnp.pad(out, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    out2 = jnp.zeros_like(img)
    for i in range(len(kern1d)):
        out2 = out2 + k[i] * jax.lax.dynamic_slice_in_dim(img_p, i, img.shape[1], 1)
    return out2


def ssim(img0, img1, max_val: float = 1.0, filter_size: int = 11,
         filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
         return_map: bool = False):
    """img: [H, W, C] in [0, max_val]. Returns mean SSIM (or the map)."""
    img0 = jnp.asarray(img0, jnp.float32)
    img1 = jnp.asarray(img1, jnp.float32)
    if img0.ndim == 2:
        img0 = img0[..., None]
        img1 = img1[..., None]
    kern = _gaussian_kernel(filter_size, filter_sigma)
    mu0 = _filter2d(img0, kern)
    mu1 = _filter2d(img1, kern)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = _filter2d(img0 * img0, kern) - mu00
    s11 = _filter2d(img1 * img1, kern) - mu11
    s01 = _filter2d(img0 * img1, kern) - mu01
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu01 + c1) * (2 * s01 + c2)) / \
               ((mu00 + mu11 + c1) * (s00 + s11 + c2))
    return ssim_map if return_map else jnp.mean(ssim_map)
