"""Forest (large-scale, block-decomposed) fields.

Reference: nr3d_lib/models/fields_forest/ — LoTDForestSDF (lotd_forest_sdf.py),
LoTDForestNeuS (lotd_forest_neus.py:218), NeuSRendererMixinForest
(renderer_mixin.py:133-886), grid_encodings/lotd/lotd_forest.py (per-block
LoTD params over a shared LoDMeta + ForestMeta).

TPU design: per-block parameters are a batched LoTD table [n_trees,
n_params]; the sample's block slot is the batched-encode `bidx`
(ops/lotd.py supports it natively), and block-local coords come from
`ForestBlockSpace.normalize_coords`. The reference's per-segment pack
merging disappears: samples stay globally t-sorted in the dense [R,S]
layout, so compositing is the ordinary alpha chain (SURVEY.md §3.5).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from nr3d_lib_tpu.graphics.nerf import ray_alpha_to_vw
from nr3d_lib_tpu.graphics.neus import neus_ray_sdf_to_alpha
from nr3d_lib_tpu.models.blocks import MLP
from nr3d_lib_tpu.models.fields.nerf import RadianceNet, trunc_exp
from nr3d_lib_tpu.models.fields.neus import get_neus_var_ctrl
from nr3d_lib_tpu.models.spatial.forest import ForestBlockSpace
from nr3d_lib_tpu.ops import lotd as _lotd

__all__ = ["LoTDForestEncoding", "LoTDForestSDF", "LoTDForestNeuS",
           "LoTDForestNeuSModel", "LoTDForestNeRF"]

Array = jax.Array


class LoTDForestEncoding(nnx.Module):
    """Per-block LoTD params over one shared meta
    (reference: lotd_forest.py:29-73 LoTDForestEncoding)."""

    def __init__(self, n_trees: int, *, lotd_cfg: Optional[dict] = None,
                 seed: int = 0, param_dtype=jnp.float32):
        cfg = dict(lotd_cfg or {})
        cfg.setdefault("lod_res", [8, 16, 32])
        cfg.setdefault("lod_n_feats", 2)
        cfg.setdefault("lod_types", ["Dense", "Dense", "Hash"])
        cfg.setdefault("hashmap_size", 2 ** 12)
        self.meta = _lotd.generate_meta(
            3, cfg["lod_res"], cfg["lod_n_feats"], cfg["lod_types"],
            hashmap_size=cfg.get("hashmap_size"))
        self.n_trees = n_trees
        self.out_features = self.meta.out_features
        self.flattened_params = nnx.Param(
            jax.random.uniform(jax.random.key(seed),
                               (n_trees, self.meta.n_params), param_dtype,
                               -1e-4, 1e-4))

    def __call__(self, x_local: Array, bidx: Array) -> Array:
        """x_local in [-1,1] per block; bidx < 0 → zero features."""
        return _lotd.lotd_encode(x_local * 0.5 + 0.5,
                                 self.flattened_params[...], self.meta,
                                 bidx=bidx)

    def state_dict(self):
        return {"flattened_params": self.flattened_params[...]}

    def load_state_dict(self, sd):
        self.flattened_params[...] = jnp.asarray(sd["flattened_params"])


class LoTDForestSDF(nnx.Module):
    """Forest SDF: shared decoder over per-block encodings
    (reference: lotd_forest_sdf.py:273)."""

    def __init__(self, space: ForestBlockSpace, *,
                 lotd_cfg: Optional[dict] = None,
                 decoder_cfg: Optional[dict] = None,
                 n_geo_feat: int = 15, seed: int = 0):
        self.space = space
        self.encoding = LoTDForestEncoding(max(space.n_trees, 1),
                                           lotd_cfg=lotd_cfg, seed=seed)
        dec = dict(decoder_cfg or {})
        dec.setdefault("D", 1)
        dec.setdefault("W", 64)
        self.decoder = MLP(self.encoding.out_features + 3, 1 + n_geo_feat,
                           **dec, seed=seed + 1)
        self.n_geo_feat = n_geo_feat

    def _sdf_h(self, x_world: Array) -> Array:
        bidx = self.space.block_of_points(x_world)
        x_local = self.space.normalize_coords(x_world, bidx)
        h = self.encoding(x_local, bidx)
        return self.decoder(jnp.concatenate([x_local, h], -1))

    def forward_sdf(self, x_world: Array) -> Dict[str, Array]:
        out = self._sdf_h(x_world)
        return {"sdf": out[..., 0], "h": out[..., 1:]}

    def forward_sdf_nablas(self, x_world: Array) -> Dict[str, Array]:
        def f(xx):
            out = self._sdf_h(xx)
            return out[..., 0], out[..., 1:]

        (sdf, h), vjp_fn = jax.vjp(f, x_world)
        nablas = vjp_fn((jnp.ones_like(sdf), jnp.zeros_like(h)))[0]
        return {"sdf": sdf, "h": h, "nablas": nablas}


class LoTDForestNeuS(nnx.Module):
    """Forest NeuS (reference: lotd_forest_neus.py:218 LoTDForestNeuS)."""

    def __init__(self, space: ForestBlockSpace, *,
                 surface_cfg: Optional[dict] = None,
                 radiance_cfg: Optional[dict] = None,
                 var_ctrl_cfg: Optional[dict] = None, seed: int = 0):
        self.implicit_surface = LoTDForestSDF(space, **(surface_cfg or {}),
                                              seed=seed)
        self.radiance = RadianceNet(
            n_extra_feat=self.implicit_surface.n_geo_feat,
            use_nablas=True, use_pos=False, **(radiance_cfg or {}),
            seed=seed + 1)
        self.var_ctrl = get_neus_var_ctrl(**(var_ctrl_cfg or {"type": "learned"}))

    def forward_inv_s(self):
        return self.var_ctrl.inv_s()


class LoTDForestNeRF(nnx.Module):
    """Forest NeRF (reference: lotd_forest_nerf.py:122)."""

    def __init__(self, space: ForestBlockSpace, *,
                 lotd_cfg: Optional[dict] = None,
                 decoder_cfg: Optional[dict] = None,
                 radiance_cfg: Optional[dict] = None,
                 n_geo_feat: int = 15, seed: int = 0):
        self.space = space
        self.encoding = LoTDForestEncoding(max(space.n_trees, 1),
                                           lotd_cfg=lotd_cfg, seed=seed)
        dec = dict(decoder_cfg or {})
        dec.setdefault("D", 1)
        dec.setdefault("W", 64)
        self.decoder = MLP(self.encoding.out_features, 1 + n_geo_feat,
                           **dec, seed=seed + 1)
        self.radiance = RadianceNet(n_extra_feat=n_geo_feat,
                                    **(radiance_cfg or {}), seed=seed + 2)

    def forward_density(self, x_world: Array) -> Dict[str, Array]:
        bidx = self.space.block_of_points(x_world)
        x_local = self.space.normalize_coords(x_world, bidx)
        h = self.decoder(self.encoding(x_local, bidx))
        sigma = trunc_exp(h[..., 0]) * (bidx >= 0)
        return {"sigma": sigma, "h": h[..., 1:]}


class LoTDForestNeuSModel(nnx.Module):
    """Renderable forest NeuS (reference: NeuSRendererMixinForest,
    fields_forest/neus/renderer_mixin.py:734 ray_query)."""

    def __init__(self, space_cfg: Optional[dict] = None, *,
                 field_cfg: Optional[dict] = None,
                 n_march_steps: int = 256, step_size: Optional[float] = None,
                 seed: int = 0):
        self.space = ForestBlockSpace(**(space_cfg or {}))
        if self.space.n_trees == 0:
            # default: fully-occupied forest until populated
            res = self.space.resolution
            corners = np.argwhere(np.ones(res, bool))
            self.space.populate_from_corners(corners)
        self.field = LoTDForestNeuS(self.space, **(field_cfg or {}), seed=seed)
        self.n_march_steps = n_march_steps
        self.step_size = step_size or (self.space.block_size / 16.0)

    def ray_test(self, rays_o: Array, rays_d: Array, **kw) -> Dict:
        return self.space.ray_test(rays_o, rays_d, **kw)

    def ray_query(self, ray_tested: Dict, key=None, with_rgb: bool = True
                  ) -> Tuple[Dict, Dict]:
        rays_o, rays_d = ray_tested["rays_o"], ray_tested["rays_d"]
        near, far, ray_mask = (ray_tested["near"], ray_tested["far"],
                               ray_tested["mask"])
        t, dt, bidx, smask = self.space.ray_march_blocks(
            rays_o, rays_d, near, far, n_steps=self.n_march_steps,
            step_size=self.step_size, perturb_key=key)
        r, s = t.shape
        x = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
        flat_x = x.reshape(r * s, 3)
        out = self.field.implicit_surface.forward_sdf_nablas(flat_x)
        sdf = jnp.where(smask, out["sdf"].reshape(r, s), 1e4)
        inv_s = self.field.forward_inv_s()
        alpha = neus_ray_sdf_to_alpha(sdf, inv_s, append_cdf_1=True)
        alpha = jnp.where(smask & ray_mask[:, None], alpha, 0.0)
        vw = ray_alpha_to_vw(alpha)
        acc = jnp.sum(vw, -1)
        rendered = {"mask_volume": jnp.where(ray_mask, acc, 0.0),
                    "depth_volume": jnp.where(
                        ray_mask, jnp.sum(vw * t, -1) / jnp.maximum(acc, 1e-10),
                        0.0)}
        if with_rgb:
            v = jnp.broadcast_to(rays_d[:, None, :], (r, s, 3)).reshape(r * s, 3)
            rgb = self.field.radiance(None, v, out["nablas"], out["h"])
            rgb = rgb.reshape(r, s, 3)
            rendered["rgb_volume"] = jnp.where(
                ray_mask[:, None], jnp.sum(vw[..., None] * rgb, -2), 0.0)
        vb = {"t": t, "alpha": alpha, "vw": vw, "sdf": sdf, "bidx": bidx,
              "nablas": out["nablas"].reshape(r, s, 3), "ray_mask": ray_mask}
        return rendered, vb
