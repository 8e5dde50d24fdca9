"""Reconstruction losses (reference: nr3d_lib/models/loss/recon.py:25-162,
utils.py:11 reduce helper)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["reduce", "mse_loss", "l1_loss", "huber_loss", "mape_loss",
           "smape_loss", "relative_l2_loss", "get_recon_loss"]

Array = jax.Array


def reduce(loss: Array, mask: Optional[Array] = None,
           reduction: str = "mean") -> Array:
    """Masked reduction (reference: loss/utils.py:11)."""
    if mask is not None:
        mask = jnp.broadcast_to(mask.astype(loss.dtype).reshape(
            mask.shape + (1,) * (loss.ndim - mask.ndim)), loss.shape)
        loss = loss * mask
        if reduction == "mean":
            return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def mse_loss(pred, gt, mask=None, reduction="mean"):
    return reduce((pred - gt) ** 2, mask, reduction)


def l1_loss(pred, gt, mask=None, reduction="mean"):
    return reduce(jnp.abs(pred - gt), mask, reduction)


def huber_loss(pred, gt, delta: float = 0.1, mask=None, reduction="mean"):
    err = pred - gt
    abs_e = jnp.abs(err)
    quad = 0.5 * err ** 2
    lin = delta * (abs_e - 0.5 * delta)
    return reduce(jnp.where(abs_e <= delta, quad, lin), mask, reduction)


def mape_loss(pred, gt, eps: float = 1e-2, mask=None, reduction="mean"):
    """Mean absolute percentage error (reference recon.py mape)."""
    return reduce(jnp.abs(pred - gt) / (jnp.abs(gt) + eps), mask, reduction)


def smape_loss(pred, gt, eps: float = 1e-2, mask=None, reduction="mean"):
    """Symmetric MAPE (reference recon.py smape)."""
    denom = 0.5 * (jnp.abs(pred) + jnp.abs(gt)) + eps
    return reduce(jnp.abs(pred - gt) / denom, mask, reduction)


def relative_l2_loss(pred, gt, eps: float = 1e-2, mask=None, reduction="mean"):
    """NGP-style relative L2 (reference recon.py relative_l2)."""
    return reduce((pred - gt) ** 2 / (jax.lax.stop_gradient(pred) ** 2 + eps),
                  mask, reduction)


def get_recon_loss(type: str = "mse", **kwargs):
    """Loss factory (reference: recon.py get_recon_loss-style dispatch)."""
    t = type.lower()
    table = {"mse": mse_loss, "l2": mse_loss, "l1": l1_loss,
             "huber": huber_loss, "smooth_l1": huber_loss,
             "mape": mape_loss, "smape": smape_loss,
             "relative_l2": relative_l2_loss}
    fn = table[t]
    import functools

    return functools.partial(fn, **kwargs) if kwargs else fn
