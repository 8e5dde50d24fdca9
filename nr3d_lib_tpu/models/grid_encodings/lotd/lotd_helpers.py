"""LoTD parameter helpers: per-level slicing, grower up-sampling, grad guard.

Reference: nr3d_lib/models/grid_encodings/lotd/lotd_helpers.py —
level_param_index_shape / get_level_param (:31-225), param_vertices /
param_interpolate for grower up-sampling (:244-274), LoTD2ndGradGuard
gradient-spike guard (:348).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nr3d_lib_tpu.ops.lotd import LoDMeta, LoDType, level_param_slice

__all__ = ["level_param_shape", "get_level_param", "set_level_param",
           "param_interpolate", "GradGuard"]

Array = jax.Array


def level_param_shape(meta: LoDMeta, level: int) -> Tuple[int, ...]:
    """Natural (unflattened) shape of one level's parameters."""
    t = meta.level_types[level]
    res = meta.level_res[level]
    f = meta.level_n_feats[level]
    if t == LoDType.Dense:
        return tuple(res) + (f,)
    return (meta.level_sizes[level], f)


def get_level_param(params: Array, meta: LoDMeta, level: int,
                    batched: bool = False) -> Array:
    """(reference get_level_param / get_level_param_batched)"""
    sl = level_param_slice(meta, level)
    if batched:
        return params[:, sl].reshape((params.shape[0],)
                                     + level_param_shape(meta, level))
    return params[sl].reshape(level_param_shape(meta, level))


def set_level_param(params: Array, meta: LoDMeta, level: int, value: Array
                    ) -> Array:
    sl = level_param_slice(meta, level)
    return params.at[sl].set(value.reshape(-1))


def param_interpolate(level_param: Array, new_res: Sequence[int]) -> Array:
    """Trilinearly up/down-sample a Dense level's vertex grid — the grower
    "rescale" path (reference param_vertices/param_interpolate :244-274).

    level_param: [rx, ry, rz, F] → [new..., F].
    """
    old = jnp.asarray(level_param)
    rx, ry, rz, f = old.shape
    outs = []
    grid = jnp.stack(jnp.meshgrid(
        jnp.linspace(0, rx - 1, new_res[0]),
        jnp.linspace(0, ry - 1, new_res[1]),
        jnp.linspace(0, rz - 1, new_res[2]), indexing="ij"), -1)
    c0 = jnp.floor(grid).astype(jnp.int32)
    c0 = jnp.minimum(c0, jnp.asarray([rx - 2, ry - 2, rz - 2]))
    w = grid - c0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wt = ((w[..., 0] if dx else 1 - w[..., 0])
                      * (w[..., 1] if dy else 1 - w[..., 1])
                      * (w[..., 2] if dz else 1 - w[..., 2]))
                out = out + wt[..., None] * old[c0[..., 0] + dx,
                                                c0[..., 1] + dy,
                                                c0[..., 2] + dz]
    return out


class GradGuard:
    """Gradient-spike guard (reference LoTD2ndGradGuard :348): clamps a
    gradient pytree whose global norm exceeds `ema_factor` × its running
    EMA — protects 2nd-order LoTD training from rare spikes."""

    def __init__(self, ema_decay: float = 0.99, ema_factor: float = 10.0):
        self.ema_decay = ema_decay
        self.ema_factor = ema_factor
        self.ema_norm: Optional[float] = None

    def __call__(self, grads):
        from nr3d_lib_tpu.models.utils import calc_grad_norm

        norm = float(calc_grad_norm(grads))
        if self.ema_norm is None:
            self.ema_norm = norm
            return grads, False
        limit = self.ema_factor * self.ema_norm
        clipped = norm > limit
        if clipped:
            scale = limit / max(norm, 1e-12)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            norm = limit
        self.ema_norm = self.ema_decay * self.ema_norm \
            + (1 - self.ema_decay) * norm
        return grads, clipped
