"""3D Gaussian splatting renderer (+ relightable render-equation head).

TPU-native re-design of the reference's r3dg tile rasterizer
(reference: externals/r3dg_rasterization N11 — rasterize_gaussians fwd/bwd,
render_equation_forward/backward, mark_visible). The CUDA design
(tile binning → per-tile depth sort → atomic alpha blending) has no TPU
analogue; here splatting is a dense depth-sorted pixel×gaussian contraction
evaluated in pixel chunks — O(P·N) on the VPU, fully differentiable by
autodiff (the hand-written CUDA backward disappears), practical for the
;≤ ~50k-gaussian scenes the reference's relighting pipeline targets.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nr3d_lib_tpu.maths.transforms import quaternion_to_matrix

__all__ = ["project_gaussians", "rasterize_gaussians", "mark_visible",
           "render_equation"]

Array = jax.Array


def _cov3d(scales: Array, quats: Array) -> Array:
    """Σ = R S Sᵀ Rᵀ (reference: cuda_rasterizer forward cov3d)."""
    r = quaternion_to_matrix(quats)
    s = r * scales[..., None, :]
    return s @ jnp.swapaxes(s, -1, -2)


def project_gaussians(means: Array, scales: Array, quats: Array,
                      w2c: Array, intr: Array
                      ) -> Dict[str, Array]:
    """World gaussians → screen-space (EWA splatting).

    means [N,3]; scales [N,3]; quats [N,4]; w2c [4,4]; intr [3,3].
    Returns mean2d [N,2], cov2d [N,2,2], depth [N], in_front mask.
    """
    r = w2c[:3, :3]
    t = w2c[:3, 3]
    cam = means @ r.T + t
    z = cam[:, 2]
    fx, fy = intr[0, 0], intr[1, 1]
    mean2d = jnp.stack([cam[:, 0] / z * fx + intr[0, 2],
                        cam[:, 1] / z * fy + intr[1, 2]], -1)
    # Jacobian of perspective projection
    zero = jnp.zeros_like(z)
    j = jnp.stack([
        jnp.stack([fx / z, zero, -fx * cam[:, 0] / (z * z)], -1),
        jnp.stack([zero, fy / z, -fy * cam[:, 1] / (z * z)], -1)], -2)  # [N,2,3]
    cov3 = _cov3d(scales, quats)
    cov_cam = jnp.einsum("ij,njk,lk->nil", r, cov3, r)
    cov2d = jnp.einsum("nij,njk,nlk->nil", j, cov_cam, j)
    # low-pass (anti-alias) like the reference: +0.3 px
    cov2d = cov2d + 0.3 * jnp.eye(2)
    return {"mean2d": mean2d, "cov2d": cov2d, "depth": z,
            "in_front": z > 0.01}


def mark_visible(means: Array, w2c: Array, intr: Array, hw: Tuple[int, int],
                 margin: float = 0.1) -> Array:
    """Frustum visibility (reference: ext.cpp mark_visible)."""
    h, w = hw
    proj = project_gaussians(means, jnp.ones_like(means) * 1e-6,
                             jnp.concatenate([jnp.ones_like(means[:, :1]),
                                              jnp.zeros_like(means)], -1),
                             w2c, intr)
    m = proj["mean2d"]
    pad_w, pad_h = margin * w, margin * h
    return (proj["in_front"] & (m[:, 0] > -pad_w) & (m[:, 0] < w + pad_w)
            & (m[:, 1] > -pad_h) & (m[:, 1] < h + pad_h))


def rasterize_gaussians(means: Array, scales: Array, quats: Array,
                        opacities: Array, colors: Array,
                        w2c: Array, intr: Array, hw: Tuple[int, int],
                        bg_color=(0.0, 0.0, 0.0),
                        pixel_chunk: int = 4096,
                        alpha_floor: float = 1.0 / 255.0
                        ) -> Dict[str, Array]:
    """Render gaussians → {rgb [H,W,3], alpha [H,W], depth [H,W]}.

    Depth-sorted global compositing: α_i(p)·Π_{j<i}(1-α_j(p)) over the
    depth order (reference: rasterize_gaussians), evaluated densely per
    pixel chunk.
    """
    h, w = hw
    proj = project_gaussians(means, scales, quats, w2c, intr)
    order = jnp.argsort(jnp.where(proj["in_front"], proj["depth"], jnp.inf))
    mean2d = proj["mean2d"][order]
    cov2d = proj["cov2d"][order]
    depth = proj["depth"][order]
    valid = proj["in_front"][order]
    op = opacities.reshape(-1)[order]
    col = colors[order]

    det = (cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0])
    det = jnp.maximum(det, 1e-9)
    inv = jnp.stack([
        jnp.stack([cov2d[:, 1, 1], -cov2d[:, 0, 1]], -1),
        jnp.stack([-cov2d[:, 1, 0], cov2d[:, 0, 0]], -1)], -2) / det[:, None, None]

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=means.dtype) + 0.5,
                          jnp.arange(w, dtype=means.dtype) + 0.5, indexing="ij")
    pix = jnp.stack([xs, ys], -1).reshape(-1, 2)
    bg = jnp.asarray(bg_color, means.dtype)

    def render_chunk(p):
        d = p[:, None, :] - mean2d[None]                       # [P,N,2]
        md = (d[..., 0] ** 2 * inv[None, :, 0, 0]
              + d[..., 1] ** 2 * inv[None, :, 1, 1]
              + 2 * d[..., 0] * d[..., 1] * inv[None, :, 0, 1])
        alpha = jnp.clip(op[None] * jnp.exp(-0.5 * md), 0.0, 0.999)
        alpha = jnp.where(valid[None] & (alpha > alpha_floor), alpha, 0.0)
        trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
        vw = alpha * trans                                     # [P,N]
        rgb = vw @ col
        acc = jnp.sum(vw, -1)
        dep = vw @ depth / jnp.maximum(acc, 1e-10)
        rgb = rgb + (1.0 - acc)[:, None] * bg
        return rgb, acc, dep

    outs_rgb, outs_a, outs_d = [], [], []
    for s in range(0, pix.shape[0], pixel_chunk):
        r_, a_, d_ = render_chunk(pix[s:s + pixel_chunk])
        outs_rgb.append(r_)
        outs_a.append(a_)
        outs_d.append(d_)
    rgb = jnp.concatenate(outs_rgb).reshape(h, w, 3)
    acc = jnp.concatenate(outs_a).reshape(h, w)
    dep = jnp.concatenate(outs_d).reshape(h, w)
    return {"rgb": rgb, "alpha": acc, "depth": dep}


def render_equation(base_color: Array, roughness: Array, normals: Array,
                    view_dirs: Array, light_dirs: Array, light_rgb: Array,
                    ambient: float = 0.1) -> Array:
    """Per-gaussian simplified BRDF shading (reference:
    render_equation_forward — r3dg's relightable per-gaussian render
    equation; simplified GGX-free Blinn-Phong form, differentiable).

    base_color [N,3], roughness [N], normals [N,3] (unit),
    view_dirs [N,3] (surface→eye), light_dirs [N,3] (surface→light).
    """
    n = normals
    l = light_dirs / jnp.maximum(
        jnp.linalg.norm(light_dirs, axis=-1, keepdims=True), 1e-8)
    v = view_dirs / jnp.maximum(
        jnp.linalg.norm(view_dirs, axis=-1, keepdims=True), 1e-8)
    ndl = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    half = l + v
    half = half / jnp.maximum(jnp.linalg.norm(half, axis=-1, keepdims=True), 1e-8)
    ndh = jnp.maximum(jnp.sum(n * half, -1), 0.0)
    shininess = 2.0 / jnp.maximum(roughness ** 2, 1e-3)
    spec = jnp.power(ndh, shininess) * (1.0 - roughness)
    diffuse = base_color * ndl[..., None]
    return (ambient * base_color + (diffuse + spec[..., None]) * light_rgb)
