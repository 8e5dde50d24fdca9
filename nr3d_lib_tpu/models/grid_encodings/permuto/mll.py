"""MLL — multi-level-lattice network.

Reference: nr3d_lib/models/grid_encodings/permuto/mll.py:49-296
(PermutohedralLatticeLayer, MLL, MLLNet): each permuto level feeds its own
small linear layer; level outputs are summed coarse→fine with
nonlinearities, ending in an output head — a decoder interleaved with the
lattice instead of stacked after it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from nr3d_lib_tpu.models.blocks import MLP, get_nonlinearity
from nr3d_lib_tpu.ops import permuto as _permuto

__all__ = ["PermutohedralLatticeLayer", "MLLNet"]

Array = jax.Array


class PermutohedralLatticeLayer(nnx.Module):
    """One lattice level + its linear mixing layer (reference mll.py:49)."""

    def __init__(self, in_dims: int, res: float, n_feats: int, width: int,
                 log2_hashmap_size: int = 14, seed: int = 0):
        self.meta = _permuto.make_permuto_meta(in_dims, [res], n_feats,
                                               log2_hashmap_size)
        self.params = nnx.Param(
            jax.random.uniform(jax.random.key(seed), (self.meta.n_params,),
                               jnp.float32, -1e-4, 1e-4))
        self.linear = MLP(n_feats, width, D=0, W=width, seed=seed + 1)

    def __call__(self, x01: Array) -> Array:
        h = _permuto.permuto_encode(x01, self.params[...], self.meta)
        return self.linear(h)


class MLLNet(nnx.Module):
    """Interleaved lattice-decoder net (reference mll.py:157 MLL /
    :296 MLLNet)."""

    def __init__(self, in_dims: int = 3, out_features: int = 1, *,
                 res_list: Sequence[float] = (8.0, 16.0, 32.0, 64.0),
                 n_feats: int = 2, width: int = 32,
                 log2_hashmap_size: int = 14,
                 activation: str = "relu", seed: int = 0):
        self.layers = nnx.List([
            PermutohedralLatticeLayer(in_dims, r, n_feats, width,
                                      log2_hashmap_size, seed=seed + 10 * i)
            for i, r in enumerate(res_list)])
        self.activation = get_nonlinearity(activation)
        self.head = MLP(width, out_features, D=0, W=width, seed=seed + 999)
        self.out_features = out_features

    def __call__(self, x: Array) -> Array:
        """x in [-1,1]^D."""
        x01 = x * 0.5 + 0.5
        h = 0.0
        for layer in self.layers:
            h = self.activation(h + layer(x01))
        return self.head(h)
