"""NeuS ray-query strategies: marched + multi-stage upsampled SDF rendering.

Reference: nr3d_lib/graphics/neus/neus_ray_query.py:132 (coarse_multi_upsample)
/ :358 (march_occ_multi_upsample, StreetSurf §4.1) / :732 (compressed).

TPU layout: dense [R, S] slabs. Invalid slots carry t=far and sdf=+BIG so
their alphas vanish; merging upsample rounds is a per-ray sort (the
reference's merge_two_packs_sorted_aligned becomes `jnp.sort` on the slab).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nr3d_lib_tpu.graphics.nerf import ray_alpha_to_vw
from nr3d_lib_tpu.graphics.neus import neus_ray_sdf_to_alpha
from nr3d_lib_tpu.graphics.raysample import batch_sample_pdf, batch_sample_step_linear

__all__ = ["neus_ray_query_march_occ_multi_upsample",
           "neus_ray_query_coarse_multi_upsample"]

Array = jax.Array

_BIG_SDF = 1e4


def _upsample_rounds(sdf_fn, o_n, d_n, t, valid, far, inv_s_base,
                     upsample_inv_s_factors, n_importance, perturb_key):
    """Iterative NeuS importance sampling (reference neus_ray_query.py:495-530
    upsample loop). Each round: alphas at growing sharpness → CDF sample →
    merge-sort into the slab."""
    r = t.shape[0]
    for round_i, factor in enumerate(upsample_inv_s_factors):
        order = jnp.argsort(jnp.where(valid, t, jnp.inf), axis=-1)
        t_sorted = jnp.take_along_axis(jnp.where(valid, t, far[:, None]), order, -1)
        v_sorted = jnp.take_along_axis(valid, order, -1)
        x = o_n[:, None, :] + d_n[:, None, :] * t_sorted[..., None]
        s = t_sorted.shape[1]
        sdf = sdf_fn(x.reshape(r * s, 3)).reshape(r, s)
        sdf = jnp.where(v_sorted, sdf, _BIG_SDF)
        alpha = neus_ray_sdf_to_alpha(sdf, inv_s_base * factor,
                                      append_cdf_1=False)          # [R,S-1]
        w = ray_alpha_to_vw(alpha)
        key_i = None
        if perturb_key is not None:
            perturb_key, key_i = jax.random.split(perturb_key)
        t_new = batch_sample_pdf(t_sorted, w, n_importance, key_i)  # [R,n_imp]
        t = jnp.concatenate([t_sorted, t_new], -1)
        valid = jnp.concatenate([v_sorted, jnp.ones_like(t_new, bool)], -1)
    order = jnp.argsort(jnp.where(valid, t, jnp.inf), axis=-1)
    t = jnp.take_along_axis(jnp.where(valid, t, far[:, None]), order, -1)
    valid = jnp.take_along_axis(valid, order, -1)
    return t, valid


def _final_composite(model, o_n, d_n, rays_d, t, valid, ray_mask, inv_s,
                     with_rgb: bool = True):
    r, s = t.shape
    x = o_n[:, None, :] + d_n[:, None, :] * t[..., None]
    flat_x = x.reshape(r * s, 3)
    v = jnp.broadcast_to(rays_d[:, None, :], (r, s, 3)).reshape(r * s, 3)
    out = model(flat_x, v, with_rgb=with_rgb, with_nablas=True)
    sdf = jnp.where(valid, out["sdf"].reshape(r, s), _BIG_SDF)
    alpha = neus_ray_sdf_to_alpha(sdf, inv_s, append_cdf_1=True)   # [R,S]
    alpha = jnp.where(valid & ray_mask[:, None], alpha, 0.0)
    vw = ray_alpha_to_vw(alpha)
    acc = jnp.sum(vw, -1)
    nablas = out.get("nablas")
    rendered = {"mask_volume": jnp.where(ray_mask, acc, 0.0)}
    if with_rgb:
        rgb = out["rgb"].reshape(r, s, 3)
        rendered["rgb_volume"] = jnp.where(
            ray_mask[:, None], jnp.sum(vw[..., None] * rgb, -2), 0.0)
    depth = jnp.sum(vw * t, -1) / jnp.maximum(acc, 1e-10)
    rendered["depth_volume"] = jnp.where(ray_mask, depth, 0.0)
    if nablas is not None:
        n_img = jnp.sum(vw[..., None] * nablas.reshape(r, s, 3), -2)
        rendered["normals_volume"] = jnp.where(ray_mask[:, None], n_img, 0.0)
    volume_buffer = {"t": t, "alpha": alpha, "vw": vw, "sdf": sdf,
                     "ray_mask": ray_mask, "valid": valid,
                     "nablas": None if nablas is None else nablas.reshape(r, s, 3),
                     "x": x}
    return rendered, volume_buffer


def neus_ray_query_coarse_multi_upsample(
        model, space, ray_tested: Dict, *,
        n_coarse: int = 64,
        upsample_inv_s_factors: Sequence[float] = (1.0, 4.0, 16.0),
        n_importance: int = 32,
        upsample_inv_s: float = 64.0,
        perturb_key=None, with_rgb: bool = True
        ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Coarse stratified + iterative upsample (reference:
    neus_ray_query.py:132 coarse_multi_upsample)."""
    rays_o, rays_d = ray_tested["rays_o"], ray_tested["rays_d"]
    near, far, ray_mask = ray_tested["near"], ray_tested["far"], ray_tested["mask"]
    o_n, d_n = space.normalize_rays(rays_o, rays_d)
    key_c = None
    if perturb_key is not None:
        perturb_key, key_c = jax.random.split(perturb_key)
    t, _ = batch_sample_step_linear(near, far, n_coarse, key_c)
    valid = jnp.ones_like(t, bool)

    def sdf_fn(x):
        return model.forward_sdf(x)["sdf"]

    t, valid = _upsample_rounds(sdf_fn, o_n, d_n, t, valid, far,
                                upsample_inv_s, upsample_inv_s_factors,
                                n_importance, perturb_key)
    return _final_composite(model, o_n, d_n, rays_d, t, valid, ray_mask,
                            model.forward_inv_s(), with_rgb)


def neus_ray_query_march_occ_multi_upsample(
        model, accel, space, ray_tested: Dict, *,
        upsample_inv_s_factors: Sequence[float] = (1.0, 4.0, 16.0),
        n_importance: int = 32,
        upsample_inv_s: float = 64.0,
        perturb_key=None, with_rgb: bool = True
        ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Occ-marched + multi-upsample (reference: neus_ray_query.py:358
    march_occ_multi_upsample — the StreetSurf §4.1 strategy)."""
    rays_o, rays_d = ray_tested["rays_o"], ray_tested["rays_d"]
    near, far, ray_mask = ray_tested["near"], ray_tested["far"], ray_tested["mask"]
    o_n, d_n = space.normalize_rays(rays_o, rays_d)
    key_m = None
    if perturb_key is not None:
        perturb_key, key_m = jax.random.split(perturb_key)
    t, dt, smask = accel.ray_march(o_n, d_n, near, far, perturb_key=key_m)

    def sdf_fn(x):
        return model.forward_sdf(x)["sdf"]

    t, valid = _upsample_rounds(sdf_fn, o_n, d_n, t, smask, far,
                                upsample_inv_s, upsample_inv_s_factors,
                                n_importance, perturb_key)
    return _final_composite(model, o_n, d_n, rays_d, t, valid, ray_mask,
                            model.forward_inv_s(), with_rgb)
