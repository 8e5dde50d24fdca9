"""Common densities + small helpers (reference: nr3d_lib/maths/common.py:109-122
logistic densities for NeuS)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["logistic_density", "logistic_cdf", "normalize"]


def logistic_density(x, inv_s):
    """s·e^{-sx} / (1+e^{-sx})² — the NeuS φ_s (reference common.py:109)."""
    return inv_s * jax.nn.sigmoid(-inv_s * x) * jax.nn.sigmoid(inv_s * x)


def logistic_cdf(x, inv_s):
    return jax.nn.sigmoid(inv_s * x)


def normalize(v, axis: int = -1, eps: float = 1e-8):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)
