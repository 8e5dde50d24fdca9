"""Distant-background fields (NeRF++ inverted sphere).

Reference: nr3d_lib/models/fields_distant/nerf/renderer_mixin.py:87-135
(NeRFRendererMixinDistant): points beyond the scene sphere are parameterized
as (x̂·r, 1/r) and sampled uniformly in inverse radius — the NeRF++ scheme
for unbounded backgrounds.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from nr3d_lib_tpu.graphics.nerf import ray_alpha_to_vw, tau_to_alpha
from nr3d_lib_tpu.models.blocks import MLP
from nr3d_lib_tpu.models.embedders import get_embedder
from nr3d_lib_tpu.models.fields.nerf import RadianceNet, trunc_exp

__all__ = ["NeRFDistant", "nerf_distant_ray_query"]

Array = jax.Array


def inverted_sphere_coords(x: Array, radius: float = 1.0) -> Array:
    """World point outside the sphere → (x̂, 1/r) 4D NeRF++ coords."""
    r = jnp.linalg.norm(x, axis=-1, keepdims=True) / radius
    return jnp.concatenate([x / jnp.maximum(r * radius, 1e-8), 1.0 / jnp.maximum(r, 1.0)], -1)


class NeRFDistant(nnx.Module):
    """Background NeRF over inverted-sphere coords
    (reference: fields_distant small nets + mixin)."""

    def __init__(self, *, pos_embed_cfg: Optional[dict] = None,
                 D: int = 3, W: int = 64, n_geo_feat: int = 15,
                 radiance_cfg: Optional[dict] = None,
                 radius: float = 1.0, seed: int = 0):
        self.radius = radius
        self.embed_fn, pos_dim = get_embedder(
            pos_embed_cfg or {"type": "sinusoidal", "n_frequencies": 4}, 4)
        self.sigma_mlp = MLP(pos_dim, 1 + n_geo_feat, D=D, W=W, seed=seed)
        self.radiance = RadianceNet(n_extra_feat=n_geo_feat,
                                    **(radiance_cfg or {}), seed=seed + 1)

    def forward_density(self, x_world: Array) -> Dict[str, Array]:
        x4 = inverted_sphere_coords(x_world, self.radius)
        h = self.sigma_mlp(self.embed_fn(x4))
        return {"sigma": trunc_exp(h[..., 0]), "h": h[..., 1:]}

    def __call__(self, x_world: Array, v: Optional[Array] = None
                 ) -> Dict[str, Array]:
        out = self.forward_density(x_world)
        out["rgb"] = self.radiance(x_world, v, None, out["h"])
        return out


def nerf_distant_ray_query(model: NeRFDistant, rays_o: Array, rays_d: Array,
                           far_inner: Array, *, n_samples: int = 32,
                           perturb_key=None
                           ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Sample the background shell uniformly in inverse radius beyond the
    inner sphere exit (reference: mixin's sphere-shell marching :87-135)."""
    r0 = rays_o.shape[0]
    # t where the ray exits the scene sphere ≈ far_inner; sample 1/s ∈ (0,1]
    if perturb_key is None:
        inv_s = jnp.linspace(1.0, 1.0 / n_samples, n_samples)
        inv_s = jnp.broadcast_to(inv_s, (r0, n_samples))
    else:
        edges = jnp.linspace(1.0, 0.0, n_samples + 1)
        u = jax.random.uniform(perturb_key, (r0, n_samples))
        inv_s = edges[:-1] - u * (edges[:-1] - edges[1:])
    t = far_inner[:, None] / jnp.maximum(inv_s, 1e-3)           # [R,S] growing
    x = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    flat = x.reshape(-1, 3)
    den = model.forward_density(flat)
    sigma = den["sigma"].reshape(r0, n_samples)
    dt = jnp.concatenate([t[:, 1:] - t[:, :-1], 1e8 * jnp.ones_like(t[:, :1])], -1)
    alpha = tau_to_alpha(sigma * dt)
    v = jnp.broadcast_to(rays_d[:, None, :], x.shape).reshape(-1, 3)
    rgb = model.radiance(flat, v, None, den["h"]).reshape(r0, n_samples, 3)
    vw = ray_alpha_to_vw(alpha)
    rendered = {"rgb_volume": jnp.sum(vw[..., None] * rgb, -2),
                "mask_volume": jnp.sum(vw, -1),
                "depth_volume": jnp.sum(vw * t, -1)
                / jnp.maximum(jnp.sum(vw, -1), 1e-10)}
    return rendered, {"t": t, "alpha": alpha, "vw": vw}
