"""Grid-encoding commons: voxel helpers + multi-res decoders.

Reference: nr3d_lib/models/grid_encodings/{utils.py:269 (trilinear voxel
helpers, gridsample1d_by2d), multires_decoder.py:157 (get_multires_decoder)}.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nr3d_lib_tpu.models.blocks import MLP

__all__ = ["trilinear_interp", "gridsample1d", "get_multires_decoder"]

Array = jax.Array


def trilinear_interp(grid: Array, x: Array) -> Array:
    """grid [rx,ry,rz,F]; x [...,3] in [-1,1] → [...,F]
    (reference utils.py trilinear voxel helpers; align_corners=True)."""
    rx, ry, rz, f = grid.shape
    res = jnp.asarray([rx, ry, rz], x.dtype)
    u = (x + 1.0) * 0.5 * (res - 1)
    c0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, jnp.asarray([rx - 2, ry - 2, rz - 2]))
    w = u - c0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wt = ((w[..., 0] if dx else 1 - w[..., 0])
                      * (w[..., 1] if dy else 1 - w[..., 1])
                      * (w[..., 2] if dz else 1 - w[..., 2]))
                out = out + wt[..., None] * grid[c0[..., 0] + dx,
                                                 c0[..., 1] + dy,
                                                 c0[..., 2] + dz]
    return out


def gridsample1d(line: Array, t: Array) -> Array:
    """line [n,F]; t [...] in [-1,1] → [...,F] (reference gridsample1d_by2d —
    torch needs a fake 2D grid_sample; JAX needs nothing)."""
    n = line.shape[0]
    u = (t + 1.0) * 0.5 * (n - 1)
    c0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 2)
    w = (u - c0)[..., None]
    return line[c0] * (1 - w) + line[c0 + 1] * w


def get_multires_decoder(level_n_feats: Sequence[int], out_features: int, *,
                         select_n_levels: Optional[int] = None,
                         reduce: str = "concat", D: int = 1, W: int = 64,
                         seed: int = 0, **mlp_kw) -> Tuple[Callable, object]:
    """Per-level select/reduce decoder factory
    (reference: multires_decoder.py get_multires_decoder).

    reduce: 'concat' (default) feeds all selected level features to the MLP;
    'sum' adds them (levels must share widths). Returns (decode_fn, mlp).
    """
    n_levels = len(level_n_feats)
    sel = n_levels if select_n_levels is None else min(select_n_levels, n_levels)
    offsets = [0]
    for f in level_n_feats:
        offsets.append(offsets[-1] + f)

    if reduce == "concat":
        in_dim = offsets[sel]

        def pre(h):
            return h[..., :offsets[sel]]
    elif reduce == "sum":
        f0 = level_n_feats[0]
        assert all(f == f0 for f in level_n_feats[:sel])
        in_dim = f0

        def pre(h):
            parts = [h[..., offsets[i]:offsets[i + 1]] for i in range(sel)]
            return sum(parts)
    else:
        raise ValueError(reduce)

    mlp = MLP(in_dim, out_features, D=D, W=W, seed=seed, **mlp_kw)

    def decode(h):
        return mlp(pre(h))

    return decode, mlp
