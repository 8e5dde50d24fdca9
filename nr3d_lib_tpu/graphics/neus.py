"""NeuS math: logistic-CDF SDF → alpha (dense + packed layouts).

Reference: nr3d_lib/graphics/neus/neus_utils.py:48-191. The NeuS estimator:
cdf = sigmoid(sdf·inv_s); α_i = clamp((cdf_i − cdf_{i+1}) / (cdf_i + ε), 0)
over consecutive samples of each ray, with an optional appended cdf=1
boundary term.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from nr3d_lib_tpu.graphics import pack_ops as po
from nr3d_lib_tpu.graphics.nerf import ray_alpha_to_vw

__all__ = [
    "neus_cdf",
    "neus_ray_sdf_to_alpha",
    "neus_ray_sdf_to_vw",
    "neus_packed_sdf_to_alpha",
    "neus_packed_sdf_to_vw",
    "neus_estimate_sdf_nablas_to_alpha",
]

Array = jax.Array


def neus_cdf(sdf: Array, inv_s) -> Array:
    return jax.nn.sigmoid(sdf * inv_s)


def neus_ray_sdf_to_alpha(sdf: Array, inv_s, append_cdf_1: bool = False) -> Array:
    """sdf [..., S] → alpha (reference neus_utils.py:75 neus_ray_sdf_to_alpha).

    Without append_cdf_1 the output has S-1 intervals; with it, S.
    """
    cdf = neus_cdf(sdf, inv_s)
    if append_cdf_1:
        nxt = jnp.concatenate([cdf[..., 1:], jnp.ones_like(cdf[..., :1])], -1)
        alpha = (cdf - nxt) / (cdf + 1e-5)
    else:
        alpha = (cdf[..., :-1] - cdf[..., 1:]) / (cdf[..., :-1] + 1e-5)
    return jnp.maximum(alpha, 0.0)


def neus_ray_sdf_to_vw(sdf: Array, inv_s, append_cdf_1: bool = False) -> Array:
    return ray_alpha_to_vw(neus_ray_sdf_to_alpha(sdf, inv_s, append_cdf_1))


def neus_packed_sdf_to_alpha(sdf: Array, inv_s, ridx: Array,
                             append_cdf_1: bool = True) -> Array:
    """Packed variant (reference neus_utils.py:110 neus_packed_sdf_to_alpha):
    per-pack forward diff of the cdf; the last sample of each pack diffs
    against cdf=1 when append_cdf_1 (i.e. its alpha covers to infinity)."""
    cdf = neus_cdf(sdf, inv_s)
    nxt_same = jnp.concatenate([ridx[1:] == ridx[:-1], jnp.zeros((1,), bool)])
    shifted = jnp.concatenate([cdf[1:], cdf[-1:]])
    last_val = jnp.ones_like(cdf) if append_cdf_1 else cdf  # α=0 at pack end otherwise
    cdf_next = jnp.where(nxt_same, shifted, last_val)
    alpha = (cdf - cdf_next) / (cdf + 1e-5)
    return jnp.maximum(alpha, 0.0)


def neus_packed_sdf_to_vw(sdf: Array, inv_s, ridx: Array,
                          append_cdf_1: bool = True) -> Array:
    return po.packed_alpha_to_vw(
        neus_packed_sdf_to_alpha(sdf, inv_s, ridx, append_cdf_1), ridx)


def neus_estimate_sdf_nablas_to_alpha(sdf: Array, deltas: Array, nablas: Array,
                                      dirs: Array, inv_s,
                                      ratio: float = 1.0,
                                      delta_max: float = 1e10) -> Array:
    """Original-NeuS estimator using section midpoint sdf + surface slope
    (reference neus_utils.py:123 neus_estimate_sdf_nablas_to_alpha,
    modified from Totoro97/NeuS): estimate prev/next sdf by the projected
    slope cosθ = ∇·d, then α from the cdf ratio."""
    deltas = jnp.minimum(deltas, delta_max)
    cos = jnp.sum(nablas * dirs, -1)
    # non-positive cos (front-facing) only; anneal via ratio
    cos = -(jax.nn.relu(-cos * 0.5 + 0.5) * (1.0 - ratio) + jax.nn.relu(-cos) * ratio)
    est_prev = sdf - cos * deltas * 0.5
    est_next = sdf + cos * deltas * 0.5
    cdf_prev = neus_cdf(est_prev, inv_s)
    cdf_next = neus_cdf(est_next, inv_s)
    alpha = (cdf_prev - cdf_next) / (cdf_prev + 1e-5)
    return jnp.clip(alpha, 0.0, 1.0)
