"""Numerically-guarded losses with custom gradients.

Reference: nr3d_lib/models/loss/safe.py:23 (SafeBCE) / :71 (ClippedMSE) —
custom-grad functions that clamp the backward signal to avoid fp blowups.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["safe_binary_cross_entropy", "clipped_mse"]


@jax.custom_vjp
def safe_binary_cross_entropy(pred, gt, clip_grad: float = 100.0):
    p = jnp.clip(pred, 1e-6, 1.0 - 1e-6)
    return -(gt * jnp.log(p) + (1.0 - gt) * jnp.log(1.0 - p))


def _bce_fwd(pred, gt, clip_grad):
    return safe_binary_cross_entropy(pred, gt, clip_grad), (pred, gt, clip_grad)


def _bce_bwd(res, g):
    pred, gt, clip_grad = res
    p = jnp.clip(pred, 1e-6, 1.0 - 1e-6)
    # d/dp [-(y log p + (1-y) log(1-p))] = (p - y) / (p (1-p)), clamped
    grad = jnp.clip((p - gt) / (p * (1.0 - p)), -clip_grad, clip_grad)
    return g * grad, g * (jnp.log(1.0 - p) - jnp.log(p)), None


safe_binary_cross_entropy.defvjp(_bce_fwd, _bce_bwd)


@jax.custom_vjp
def clipped_mse(pred, gt, clip_err: float = 1.0):
    return (pred - gt) ** 2


def _cmse_fwd(pred, gt, clip_err):
    return clipped_mse(pred, gt, clip_err), (pred, gt, clip_err)


def _cmse_bwd(res, g):
    pred, gt, clip_err = res
    err = jnp.clip(pred - gt, -clip_err, clip_err)
    return g * 2.0 * err, -g * 2.0 * err, None


clipped_mse.defvjp(_cmse_fwd, _cmse_bwd)
