"""NeRF ray-query strategies.

Reference: nr3d_lib/graphics/nerf/nerf_ray_query.py:29 (march_occ) /
:190 (march_occ_multi_upsample_compressed). TPU layout: dense [R, S] sample
slabs with validity masks (padding never contributes: alpha forced to 0),
avoiding the reference's ragged packed buffers on the hot path. The
"compressed" path drops dead samples before the expensive radiance query via
pack-compaction (reference packed_volume_render_compression).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nr3d_lib_tpu.graphics import pack_ops as po
from nr3d_lib_tpu.graphics.nerf import ray_alpha_to_vw, tau_to_alpha

__all__ = ["nerf_ray_query_march_occ", "nerf_ray_query_march_occ_compressed",
           "nerf_ray_query_fixed"]

Array = jax.Array


def _composite(t: Array, alpha: Array, rgb: Array, ray_mask: Array
               ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    vw = ray_alpha_to_vw(alpha)                              # [R,S]
    acc = jnp.sum(vw, -1)
    rgb_out = jnp.sum(vw[..., None] * rgb, -2)
    depth = jnp.sum(vw * t, -1) / jnp.maximum(acc, 1e-10)
    rendered = {
        "rgb_volume": jnp.where(ray_mask[:, None], rgb_out, 0.0),
        "depth_volume": jnp.where(ray_mask, depth, 0.0),
        "mask_volume": jnp.where(ray_mask, acc, 0.0),
    }
    volume_buffer = {"t": t, "alpha": alpha, "vw": vw, "rgb": rgb,
                     "ray_mask": ray_mask}
    return rendered, volume_buffer


def nerf_ray_query_march_occ(model, accel, space, ray_tested: Dict, *,
                             perturb_key=None,
                             with_rgb: bool = True
                             ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Occupancy-marched NeRF query (reference: nerf_ray_query.py:29
    nerf_ray_query_march_occ).

    model: object with forward_density(x)->{sigma,h} and
    radiance(x,v,n,h)->rgb; x in normalized [-1,1].
    """
    rays_o, rays_d = ray_tested["rays_o"], ray_tested["rays_d"]
    near, far, ray_mask = ray_tested["near"], ray_tested["far"], ray_tested["mask"]
    o_n, d_n = space.normalize_rays(rays_o, rays_d)
    t, dt, smask = accel.ray_march(o_n, d_n, near, far, perturb_key=perturb_key)
    x = o_n[:, None, :] + d_n[:, None, :] * t[..., None]      # [R,S,3]
    r, s = t.shape
    den = model.forward_density(x.reshape(r * s, 3))
    sigma = den["sigma"].reshape(r, s)
    alpha = tau_to_alpha(sigma * dt)
    alpha = jnp.where(smask & ray_mask[:, None], alpha, 0.0)
    if with_rgb:
        v = jnp.broadcast_to(rays_d[:, None, :], (r, s, 3)).reshape(r * s, 3)
        rgb = model.radiance(x.reshape(r * s, 3), v, None, den["h"]).reshape(r, s, 3)
    else:
        rgb = jnp.zeros((r, s, 3), t.dtype)
    return _composite(t, alpha, rgb, ray_mask)


def nerf_ray_query_march_occ_compressed(
        model, accel, space, ray_tested: Dict, *,
        compression_factor: float = 0.25, early_stop_eps: float = 1e-4,
        perturb_key=None, with_rgb: bool = True
        ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Occupancy-marched NeRF query with TWO compactions on the hot path
    (reference: nerf_ray_query.py:190 march_occ_multi_upsample_compressed +
    packed_volume_render_compression, pack_ops.py:286):

      1. compact the marched slab on the occupancy mask BEFORE the density
         query — the encode+MLP only touch occupied samples (the dense-slab
         march evaluates every [R,S] slot, occupied or not);
      2. compact again on accumulated transmittance (early termination)
         before the radiance query.

    A per-ray sample budget bounds saturation so a full buffer drops each
    ray's own tail rather than whole rays (see neus_ray_query_variants.py).
    """
    rays_o, rays_d = ray_tested["rays_o"], ray_tested["rays_d"]
    near, far, ray_mask = ray_tested["near"], ray_tested["far"], ray_tested["mask"]
    o_n, d_n = space.normalize_rays(rays_o, rays_d)
    t, dt, smask = accel.ray_march(o_n, d_n, near, far, perturb_key=perturb_key)
    r, s = t.shape
    smask = smask & ray_mask[:, None]

    # --- compaction 1: occupancy (budgeted)
    capacity = max(int(r * s * compression_factor), r)
    budget = max(capacity // r, 1)
    rank = jnp.cumsum(smask.astype(jnp.int32), axis=-1) - 1
    keep = smask & (rank < budget)
    flat = jnp.stack([t, dt], axis=-1)                       # [R,S,2]
    td_p, ridx = po.dense_to_packed(flat, keep, capacity)
    t_p, dt_p = td_p[:, 0], td_p[:, 1]
    vmask = ridx < r
    sel = jnp.minimum(ridx, r - 1)
    x_p = o_n[sel] + d_n[sel] * t_p[:, None]

    den = model.forward_density(x_p)
    alpha_p = tau_to_alpha(den["sigma"] * dt_p)
    alpha_p = jnp.where(vmask, alpha_p, 0.0)

    # --- compaction 2: early termination before the radiance net
    keep2, vw0 = po.packed_volume_render_compression(
        alpha_p, ridx, r, early_stop_eps=early_stop_eps)
    keep2 = keep2 & vmask & (alpha_p > 0)
    cap2 = max(capacity // 2, r)
    (t2, alpha2, h2), ridx2 = po.compactify(
        keep2, [t_p, alpha_p, den["h"]], ridx, r, capacity=cap2)
    vmask2 = ridx2 < r
    sel2 = jnp.minimum(ridx2, r - 1)
    x2 = o_n[sel2] + d_n[sel2] * t2[:, None]

    vw = po.packed_alpha_to_vw(jnp.where(vmask2, alpha2, 0.0), ridx2)
    acc = po.packed_sum(vw, ridx2, r)
    depth = po.packed_sum(vw * t2, ridx2, r) / jnp.maximum(acc, 1e-10)
    rendered = {"mask_volume": jnp.where(ray_mask, acc, 0.0),
                "depth_volume": jnp.where(ray_mask, depth, 0.0)}
    if with_rgb:
        rgb = model.radiance(x2, rays_d[sel2], None, h2)
        rgb_out = po.packed_sum(vw[:, None] * rgb, ridx2, r)
        rendered["rgb_volume"] = jnp.where(ray_mask[:, None], rgb_out, 0.0)
    volume_buffer = {"t_packed": t2, "ridx": ridx2, "alpha_packed": alpha2,
                     "vw_packed": vw, "ray_mask": ray_mask,
                     "n_compact": jnp.sum(vmask2)}
    return rendered, volume_buffer


def nerf_ray_query_fixed(model, space, ray_tested: Dict, *, n_samples: int = 128,
                         perturb_key=None
                         ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Fixed-count stratified sampling without acceleration — the minimum
    end-to-end slice (SURVEY.md §7 build step 3)."""
    from nr3d_lib_tpu.graphics.raysample import batch_sample_step_linear

    rays_o, rays_d = ray_tested["rays_o"], ray_tested["rays_d"]
    near, far, ray_mask = ray_tested["near"], ray_tested["far"], ray_tested["mask"]
    o_n, d_n = space.normalize_rays(rays_o, rays_d)
    t, dt = batch_sample_step_linear(near, far, n_samples, perturb_key)
    x = o_n[:, None, :] + d_n[:, None, :] * t[..., None]
    r, s = t.shape
    den = model.forward_density(x.reshape(r * s, 3))
    sigma = den["sigma"].reshape(r, s)
    alpha = tau_to_alpha(sigma * dt)
    alpha = jnp.where(ray_mask[:, None], alpha, 0.0)
    v = jnp.broadcast_to(rays_d[:, None, :], (r, s, 3)).reshape(r * s, 3)
    rgb = model.radiance(x.reshape(r * s, 3), v, None, den["h"]).reshape(r, s, 3)
    return _composite(t, alpha, rgb, ray_mask)
