"""3D Gaussian splatting renderer (+ relightable render-equation head).

TPU-native re-design of the reference's r3dg tile rasterizer
(reference: externals/r3dg_rasterization N11 — rasterize_gaussians fwd/bwd,
render_equation_forward/backward, mark_visible). Two paths:

  * `rasterize_gaussians` — dense depth-sorted pixel×gaussian contraction in
    pixel chunks, O(P·N): simplest correct form, the parity oracle, fine for
    ≤ ~50k gaussians.
  * `rasterize_gaussians_tiled` — the scalable path mirroring the CUDA
    pipeline with static shapes (reference: cuda_rasterizer/rasterizer_impl.cu
    duplicateWithKeys → RadixSort → identifyTileRanges → per-tile blend):
    each gaussian emits up to `tiles_per_gaussian` (tile, depth) pairs, one
    stable sort orders pairs by (tile, depth), a rank-scatter builds a
    [tiles, capacity] id table, and tiles blend their ≤capacity gaussians
    front-to-back — O(T·tile²·K). Atomics/workqueues are replaced by sort +
    segmented rank, the classic deterministic-parallel substitute, and the
    hand-written CUDA backward by autodiff.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nr3d_lib_tpu.maths.transforms import quaternion_to_matrix

__all__ = ["project_gaussians", "rasterize_gaussians",
           "rasterize_gaussians_tiled", "mark_visible",
           "render_equation", "render_equation_r3dg", "eval_sh_colors"]

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


def eval_sh_colors(shs: Array, dirs: Array) -> Array:
    """View-dependent color from per-gaussian SH coefficients (reference:
    cuda_rasterizer/forward.cu computeColorFromSH).

    shs [N, K, 3] with K ∈ {1, 4, 9, 16}; dirs [N, 3] (camera→gaussian,
    need not be normalized). Returns rgb [N, 3] (clamped at 0 like the
    reference's max(result + 0.5, 0))."""
    from nr3d_lib_tpu.models.embedders import sh_encode

    degree = int(round(math.sqrt(shs.shape[1])))
    assert degree * degree == shs.shape[1], "K must be a square (1/4/9/16)"
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    basis = sh_encode(d, degree)                                  # [N, K]
    return jnp.maximum(jnp.einsum("nk,nkc->nc", basis, shs) + 0.5, 0.0)


def _screen_radius(cov2d: Array) -> Array:
    """3σ extent from the 2D covariance's largest eigenvalue
    (reference: forward.cu preprocess 'my_radius')."""
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    return 3.0 * jnp.sqrt(jnp.maximum(lam, 0.0))


def _inv_cov2d(cov2d: Array) -> Array:
    det = (cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0])
    det = jnp.maximum(det, 1e-9)
    return jnp.stack([
        jnp.stack([cov2d[:, 1, 1], -cov2d[:, 0, 1]], -1),
        jnp.stack([-cov2d[:, 1, 0], cov2d[:, 0, 0]], -1)],
        -2) / det[:, None, None]


# attrs-row indices for the Pallas blend ([T, _N_ATTR, K] layout)
_A_MUX, _A_MUY, _A_IC00, _A_IC01, _A_IC11, _A_OP, \
    _A_CR, _A_CG, _A_CB, _A_DEP, _A_LIVE = range(11)
_N_ATTR = 16  # padded sublane count


def _lane_shift_right(x: Array, s: int) -> Array:
    """Shift x right by s along the last (lane) axis, filling with 1.0 —
    static concat+slice, pure vector work."""
    return jnp.concatenate([jnp.ones_like(x[:, :s]), x[:, :-s]], axis=1)


def _blend_tile_kernel(tile: int, cap: int, bg, alpha_floor: float,
                       attrs_ref, orig_ref, out_ref):
    """Front-to-back composite of one tile's ≤cap gaussians, VMEM-local.

    The XLA blend materializes [chunk, P, K] temporaries through HBM —
    ~70 ms/frame of pure bandwidth at 500k×512². Here everything lives
    in-register: alpha [P, K] (P = tile² sublanes, K lanes), inclusive
    transmittance via a Hillis-Steele doubling scan along lanes, then
    lane-reductions for rgb/acc/depth. Training differentiates through
    `_blend_tiles_pallas` (custom_vjp → `_blend_tile_bwd_kernel`)."""
    from jax.experimental import pallas as pl

    P = tile * tile
    a = attrs_ref[0]                                           # [A, K]

    def row(i):
        return a[i:i + 1, :]                                   # [1, K]

    t_id = pl.program_id(0)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (P, cap), 0)
    px = (p_idx % tile).astype(jnp.float32) + 0.5 + orig_ref[0, t_id]
    py = (p_idx // tile).astype(jnp.float32) + 0.5 + orig_ref[1, t_id]
    dx = px - row(_A_MUX)
    dy = py - row(_A_MUY)
    md = (dx * dx * row(_A_IC00) + dy * dy * row(_A_IC11)
          + 2.0 * dx * dy * row(_A_IC01))
    alpha = jnp.clip(row(_A_OP) * jnp.exp(-0.5 * md), 0.0, 0.999)
    alpha = jnp.where((row(_A_LIVE) > 0.0) & (alpha > alpha_floor),
                      alpha, 0.0)
    t = 1.0 - alpha + 1e-10
    s = 1
    while s < cap:                       # inclusive cumprod along lanes
        t = t * _lane_shift_right(t, s)
        s *= 2
    trans = _lane_shift_right(t, 1)      # exclusive
    vw = alpha * trans                                          # [P, K]
    acc = jnp.sum(vw, axis=1, keepdims=True)                    # [P, 1]
    out = [jnp.sum(vw * row(_A_CR + c), axis=1, keepdims=True)
           + (1.0 - acc) * bg[c] for c in range(3)]
    dep = jnp.sum(vw * row(_A_DEP), axis=1, keepdims=True) \
        / jnp.maximum(acc, 1e-10)
    out_ref[0] = jnp.concatenate(
        out + [acc, dep, jnp.zeros((P, 3), jnp.float32)], axis=1)


def _lane_shift_left(x: Array, s: int) -> Array:
    """Shift x left by s along the last (lane) axis, filling with 0.0."""
    return jnp.concatenate([x[:, s:], jnp.zeros_like(x[:, :s])], axis=1)


def _blend_tile_bwd_kernel(tile: int, cap: int, bg, alpha_floor: float,
                           attrs_ref, orig_ref, gout_ref, dattrs_ref):
    """Backward of the per-tile blend, VMEM-local (reference:
    r3dg cuda_rasterizer/backward.cu renderCUDA — the back-to-front
    re-walk). Recomputes alpha/transmittance from attrs, turns the
    downstream Σ_{j>k} chain into one reverse Hillis-Steele lane scan,
    and reduces per-gaussian gradients over the tile's pixels (sublanes).
    Emits dL/dattrs [A, K]; the caller's XLA gather-transpose scatters
    rows back onto gaussians."""
    from jax.experimental import pallas as pl

    P = tile * tile
    a = attrs_ref[0]                                           # [A, K]

    def row(i):
        return a[i:i + 1, :]

    t_id = pl.program_id(0)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (P, cap), 0)
    px = (p_idx % tile).astype(jnp.float32) + 0.5 + orig_ref[0, t_id]
    py = (p_idx // tile).astype(jnp.float32) + 0.5 + orig_ref[1, t_id]
    dx = px - row(_A_MUX)
    dy = py - row(_A_MUY)
    md = (dx * dx * row(_A_IC00) + dy * dy * row(_A_IC11)
          + 2.0 * dx * dy * row(_A_IC01))
    G = jnp.exp(-0.5 * md)
    raw = row(_A_OP) * G
    alpha = jnp.clip(raw, 0.0, 0.999)
    live = (row(_A_LIVE) > 0.0) & (alpha > alpha_floor)
    alpha = jnp.where(live, alpha, 0.0)
    t = 1.0 - alpha + 1e-10
    s = 1
    tc = t
    while s < cap:                       # inclusive cumprod along lanes
        tc = tc * _lane_shift_right(tc, s)
        s *= 2
    trans = _lane_shift_right(tc, 1)     # exclusive transmittance
    vw = alpha * trans                                          # [P, K]
    acc = jnp.sum(vw, axis=1, keepdims=True)                    # [P, 1]
    A_ = jnp.maximum(acc, 1e-10)
    dep = jnp.sum(vw * row(_A_DEP), axis=1, keepdims=True) / A_

    g = gout_ref[0]                                             # [P, 8]
    g_rgb = [g[:, c:c + 1] for c in range(3)]
    g_acc = g[:, 3:4]
    g_dep = g[:, 4:5]

    # dL/dvw_k: rgb (with bg complement), acc, and the normalized depth
    dvw = g_acc + g_dep * (row(_A_DEP) - dep) / A_
    for c in range(3):
        dvw = dvw + g_rgb[c] * (row(_A_CR + c) - bg[c])

    # dL/dalpha_k = dvw_k·T_k − (Σ_{j>k} dvw_j·vw_j) / (1−alpha_k+eps)
    u = dvw * vw
    s = 1
    rc = u
    while s < cap:                       # reverse inclusive cumsum
        rc = rc + _lane_shift_left(rc, s)
        s *= 2
    B = _lane_shift_left(rc, 1)          # Σ over j>k
    dalpha = dvw * trans - B / t
    # clip/mask subgradients: inactive lanes and saturated alphas get 0
    dalpha = jnp.where(live & (raw < 0.999), dalpha, 0.0)

    d_op = jnp.sum(dalpha * G, axis=0, keepdims=True)           # [1, K]
    dmd = dalpha * raw * (-0.5)                                 # [P, K]
    d_ic00 = jnp.sum(dmd * dx * dx, axis=0, keepdims=True)
    d_ic11 = jnp.sum(dmd * dy * dy, axis=0, keepdims=True)
    d_ic01 = jnp.sum(dmd * 2.0 * dx * dy, axis=0, keepdims=True)
    ddx = dmd * (2.0 * dx * row(_A_IC00) + 2.0 * dy * row(_A_IC01))
    ddy = dmd * (2.0 * dy * row(_A_IC11) + 2.0 * dx * row(_A_IC01))
    d_mux = -jnp.sum(ddx, axis=0, keepdims=True)
    d_muy = -jnp.sum(ddy, axis=0, keepdims=True)
    d_col = [jnp.sum(g_rgb[c] * vw, axis=0, keepdims=True) for c in range(3)]
    d_dep = jnp.sum(g_dep * vw / A_, axis=0, keepdims=True)

    K = a.shape[1]
    dattrs_ref[0] = jnp.concatenate(
        [d_mux, d_muy, d_ic00, d_ic01, d_ic11, d_op] + d_col
        + [d_dep, jnp.zeros((_N_ATTR - 10, K), jnp.float32)], axis=0)


def _blend_tiles_pallas_raw(attrs: Array, origin: Array, bg, tile: int,
                            alpha_floor: float, interpret: bool = False
                            ) -> Tuple[Array, Array, Array]:
    """attrs [T, _N_ATTR, K], origin [T, 2] → (rgb [T,P,3], acc [T,P],
    dep [T,P])."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, A, cap = attrs.shape
    P = tile * tile
    # the kernel blends in f32 regardless of x64 mode
    attrs = attrs.astype(jnp.float32)
    origin = origin.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_blend_tile_kernel, tile, cap,
                          tuple(float(c) for c in bg), alpha_floor),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, A, cap), lambda i: (i, 0, 0)),
                  # whole [2, T] origin table rides SMEM (a (1,2) block
                  # violates the TPU block-divisibility rule); the kernel
                  # indexes it by program_id
                  pl.BlockSpec((2, T), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, P, 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
        interpret=interpret,
    )(attrs, origin.T)
    return out[..., 0:3], out[..., 3], out[..., 4]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _blend_tiles_pallas(attrs: Array, origin: Array, bg, tile: int,
                        alpha_floor: float, interpret: bool = False
                        ) -> Tuple[Array, Array, Array]:
    """Differentiable VMEM-local per-tile blend (round 5 — VERDICT r04 #5):
    the forward is `_blend_tile_kernel`; the backward is a second Pallas
    kernel (`_blend_tile_bwd_kernel`) instead of the ~70 ms/frame of HBM
    temporaries the XLA blend materializes, so 3DGS *training* runs the
    fast path end to end."""
    return _blend_tiles_pallas_raw(attrs, origin, bg, tile, alpha_floor,
                                   interpret)


def _blend_fwd(attrs, origin, bg, tile, alpha_floor, interpret):
    out = _blend_tiles_pallas_raw(attrs, origin, bg, tile, alpha_floor,
                                  interpret)
    return out, (attrs, origin)


def _blend_bwd(bg, tile, alpha_floor, interpret, res, g):
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    attrs, origin = res
    g_rgb, g_acc, g_dep = g
    T, A, cap = attrs.shape
    P = tile * tile
    gout = jnp.concatenate(
        [g_rgb.astype(jnp.float32),
         g_acc[..., None].astype(jnp.float32),
         g_dep[..., None].astype(jnp.float32),
         jnp.zeros((T, P, 3), jnp.float32)], axis=-1)           # [T,P,8]
    dattrs = pl.pallas_call(
        _ft.partial(_blend_tile_bwd_kernel, tile, cap,
                    tuple(float(c) for c in bg), alpha_floor),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, A, cap), lambda i: (i, 0, 0)),
                  pl.BlockSpec((2, T), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, P, 8), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, A, cap), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, A, cap), jnp.float32),
        interpret=interpret,
    )(attrs.astype(jnp.float32), origin.astype(jnp.float32).T, gout)
    return dattrs.astype(attrs.dtype), jnp.zeros_like(origin)


_blend_tiles_pallas.defvjp(_blend_fwd, _blend_bwd)


def rasterize_gaussians_tiled(means: Array, scales: Array, quats: Array,
                              opacities: Array, colors: Array,
                              w2c: Array, intr: Array, hw: Tuple[int, int],
                              bg_color=(0.0, 0.0, 0.0),
                              tile: int = 16,
                              tiles_per_gaussian: int = 16,
                              tile_capacity: int = 256,
                              tile_chunk: int = 32,
                              alpha_floor: float = 1.0 / 255.0,
                              blend_backend: str = "xla"
                              ) -> Dict[str, Array]:
    """Tile-binned splatting — the scalable path (see module docstring).

    Static-shape caps (both are coverage bounds, not correctness knobs for
    in-range scenes):
      tiles_per_gaussian: a gaussian touching more than this many tiles
        (footprint wider than ~√cap·tile px) loses its out-of-window tiles;
      tile_capacity: a tile keeps only its nearest `tile_capacity` gaussians
        by depth — the same front-to-back truncation the reference's
        saturation (T < 1e-4 early-out) produces.
    Returns {rgb [H,W,3], alpha, depth, n_dropped_pairs} — n_dropped_pairs
    reports capacity truncation instead of silently hiding it.
    """
    h, w = hw
    n = means.shape[0]
    th, tw = -(-h // tile), -(-w // tile)
    n_tiles = th * tw
    win = int(math.isqrt(tiles_per_gaussian))
    assert win * win == tiles_per_gaussian, \
        "tiles_per_gaussian must be a square"

    proj = project_gaussians(means, scales, quats, w2c, intr)
    mean2d, cov2d, depth = proj["mean2d"], proj["cov2d"], proj["depth"]
    radius = _screen_radius(cov2d)
    inv = _inv_cov2d(cov2d)
    op = opacities.reshape(-1)
    on_screen = (proj["in_front"]
                 & (mean2d[:, 0] + radius > 0) & (mean2d[:, 0] - radius < w)
                 & (mean2d[:, 1] + radius > 0) & (mean2d[:, 1] - radius < h))

    # --- pair expansion: each gaussian → win×win candidate tiles anchored at
    # its bbox corner (reference duplicateWithKeys, static-capacity form)
    t0x = jnp.floor((mean2d[:, 0] - radius) / tile).astype(jnp.int32)
    t0y = jnp.floor((mean2d[:, 1] - radius) / tile).astype(jnp.int32)
    t1x = jnp.floor((mean2d[:, 0] + radius) / tile).astype(jnp.int32)
    t1y = jnp.floor((mean2d[:, 1] + radius) / tile).astype(jnp.int32)
    dx = jnp.arange(win, dtype=jnp.int32)
    tx = t0x[:, None, None] + dx[None, None, :]                  # [N,1,win]
    ty = t0y[:, None, None] + dx[None, :, None]                  # [N,win,1]
    tx, ty = jnp.broadcast_to(tx, (n, win, win)), \
        jnp.broadcast_to(ty, (n, win, win))
    pair_ok = (on_screen[:, None, None]
               & (tx >= 0) & (tx < tw) & (ty >= 0) & (ty < th)
               & (tx <= t1x[:, None, None]) & (ty <= t1y[:, None, None]))
    n_dropped_window = jnp.sum(
        jnp.maximum((jnp.clip(t1x, 0, tw - 1) - jnp.maximum(t0x, 0) + 1)
                    * (jnp.clip(t1y, 0, th - 1) - jnp.maximum(t0y, 0) + 1)
                    - tiles_per_gaussian, 0) * on_screen)
    pair_tile = jnp.where(pair_ok, ty * tw + tx, n_tiles).reshape(-1)  # [M]
    pair_gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None, None],
                                (n, win, win)).reshape(-1)

    # --- (tile, depth) ordering in ONE multi-key payload sort (reference:
    # one 64-bit radix sort over tile|depth keys). The previous
    # argsort → gather → stable-argsort → gather chain plus an M-element
    # `searchsorted` all ran at scalar-gather rates on v5e (the lane-gather
    # rule, DESIGN.md §3 round-3b) and dominated the whole rasterizer.
    pair_depth = jnp.broadcast_to(depth[:, None, None],
                                  (n, win, win)).reshape(-1)
    # Pack (tile, depth) into ONE u32 key when tile ids fit ≤ 20 bits:
    # tile in the high bits, the top bits of the positive-float depth
    # bitpattern (monotone for depth > 0) below — a 2-operand sort moves
    # 1/3 less data than the 3-operand 2-key form. ≥ 12 depth bits ≈
    # relative depth resolution ≤ 2⁻⁴ of the exponent step — ample for
    # blend ordering; ties break arbitrarily, as the reference radix does.
    tile_bits = max((n_tiles + 1).bit_length(), 1)
    if tile_bits <= 20:
        dshift = jnp.uint32(32 - tile_bits)
        dbits = jax.lax.bitcast_convert_type(
            jnp.maximum(pair_depth.astype(jnp.float32), 1e-6),
            jnp.uint32) >> jnp.uint32(tile_bits)
        key = (pair_tile.astype(jnp.uint32) << dshift) | dbits
        key_s, pair_gid_s = jax.lax.sort((key, pair_gid), num_keys=1)
        pair_tile_s = (key_s >> dshift).astype(jnp.int32)
    else:
        pair_tile_s, _, pair_gid_s = jax.lax.sort(
            (pair_tile, pair_depth, pair_gid), num_keys=2)

    # --- tile ranges → table by GATHER, not scatter: after the sort each
    # tile's entries are CONTIGUOUS, so `first[t]` (1025 binary searches)
    # + a [T, cap] gather replaces the M-element rank/scatter pipeline
    # (cummax + 8M-slot scatter measured ~46 ms of the 500k-frame).
    m_pairs = pair_tile_s.shape[0]
    first = jnp.searchsorted(
        pair_tile_s, jnp.arange(n_tiles + 1, dtype=pair_tile_s.dtype),
        side="left")
    seg_len = first[1:] - first[:-1]                         # [n_tiles]
    n_dropped_cap = jnp.sum(jnp.maximum(seg_len - tile_capacity, 0))
    pos = first[:n_tiles, None] + jnp.arange(tile_capacity,
                                             dtype=jnp.int32)[None, :]
    valid_tab = pos < first[1:, None]
    table = jnp.where(valid_tab,
                      pair_gid_s[jnp.minimum(pos, m_pairs - 1)], n)

    # --- per-tile blend, chunked over tiles to bound VMEM/HBM footprint
    pad = lambda a, v: jnp.concatenate([a, jnp.full((1,) + a.shape[1:], v,
                                                    a.dtype)], 0)
    mean2d_p, inv_p = pad(mean2d, 0.0), pad(inv, 0.0)
    op_p, col_p = pad(op, 0.0), pad(colors, 0.0)
    depth_p = pad(depth, 0.0)

    ty_all = jnp.arange(n_tiles, dtype=jnp.int32) // tw
    tx_all = jnp.arange(n_tiles, dtype=jnp.int32) % tw
    oy, ox = jnp.meshgrid(jnp.arange(tile, dtype=means.dtype) + 0.5,
                          jnp.arange(tile, dtype=means.dtype) + 0.5,
                          indexing="ij")
    offs = jnp.stack([ox, oy], -1).reshape(-1, 2)                # [tile²,2]
    bg = jnp.asarray(bg_color, means.dtype)

    n_chunks = -(-n_tiles // tile_chunk)
    n_tiles_pad = n_chunks * tile_chunk
    table_pad = jnp.concatenate(
        [table, jnp.full((n_tiles_pad - n_tiles, tile_capacity), n,
                         jnp.int32)], 0)
    origin = jnp.stack([tx_all * tile, ty_all * tile], -1).astype(means.dtype)
    origin_pad = jnp.concatenate(
        [origin, jnp.zeros((n_tiles_pad - n_tiles, 2), means.dtype)], 0)

    def blend_chunk(args):
        ids, orig = args                         # [C,K], [C,2]
        mu = mean2d_p[ids]                       # [C,K,2]
        ic = inv_p[ids]                          # [C,K,2,2]
        a0 = op_p[ids]                           # [C,K]
        cl = col_p[ids]                          # [C,K,3]
        dp = depth_p[ids]                        # [C,K]
        live = ids < n
        pix = orig[:, None, :] + offs[None]      # [C,P,2]
        d2 = pix[:, :, None, :] - mu[:, None, :, :]          # [C,P,K,2]
        md = (d2[..., 0] ** 2 * ic[:, None, :, 0, 0]
              + d2[..., 1] ** 2 * ic[:, None, :, 1, 1]
              + 2 * d2[..., 0] * d2[..., 1] * ic[:, None, :, 0, 1])
        alpha = jnp.clip(a0[:, None, :] * jnp.exp(-0.5 * md), 0.0, 0.999)
        alpha = jnp.where(live[:, None, :] & (alpha > alpha_floor), alpha, 0.0)
        trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = jnp.concatenate([jnp.ones_like(trans[..., :1]),
                                 trans[..., :-1]], -1)
        vw = alpha * trans                                    # [C,P,K]
        rgb = jnp.einsum("cpk,ckx->cpx", vw, cl)
        acc = jnp.sum(vw, -1)
        dep = jnp.sum(vw * dp[:, None, :], -1) / jnp.maximum(acc, 1e-10)
        rgb = rgb + (1.0 - acc)[..., None] * bg
        return rgb, acc, dep

    if blend_backend in ("pallas", "interpret"):
        # VMEM-local per-tile blend (fwd-only; see _blend_tile_kernel).
        # Pre-gather per-(tile,slot) attrs once in XLA — T·K row gathers
        # (~1 ms at 500k), then zero HBM temporaries inside the kernel.
        ids = table_pad                                        # [T,K]
        live = (ids < n).astype(jnp.float32)
        mu = mean2d_p[ids]
        ic = inv_p[ids]
        cl = col_p[ids]
        attrs = jnp.stack([
            mu[..., 0], mu[..., 1],
            ic[..., 0, 0], ic[..., 0, 1], ic[..., 1, 1],
            op_p[ids], cl[..., 0], cl[..., 1], cl[..., 2],
            depth_p[ids], live], axis=1)                       # [T,11,K]
        attrs = jnp.concatenate(
            [attrs, jnp.zeros((attrs.shape[0], _N_ATTR - attrs.shape[1],
                               attrs.shape[2]), attrs.dtype)], axis=1)
        rgb_t, acc_t, dep_t = _blend_tiles_pallas(
            attrs, origin_pad.astype(jnp.float32),
            tuple(float(c) for c in bg_color), tile,
            alpha_floor, blend_backend == "interpret")
    else:
        rgb_t, acc_t, dep_t = jax.lax.map(
            blend_chunk,
            (table_pad.reshape(n_chunks, tile_chunk, tile_capacity),
             origin_pad.reshape(n_chunks, tile_chunk, 2)))
    # [..., tile², ...] → tiles → image
    rgb_t = rgb_t.reshape(n_tiles_pad, tile, tile, 3)[:n_tiles]
    acc_t = acc_t.reshape(n_tiles_pad, tile, tile)[:n_tiles]
    dep_t = dep_t.reshape(n_tiles_pad, tile, tile)[:n_tiles]

    def tiles_to_image(tiles_flat):
        img = tiles_flat.reshape((th, tw, tile, tile)
                                 + tiles_flat.shape[3:])
        img = jnp.swapaxes(img, 1, 2).reshape(
            (th * tile, tw * tile) + tiles_flat.shape[3:])
        return img[:h, :w]

    return {"rgb": tiles_to_image(rgb_t), "alpha": tiles_to_image(acc_t),
            "depth": tiles_to_image(dep_t),
            "n_dropped_pairs": n_dropped_cap + n_dropped_window}


def render_equation_r3dg(base_color: Array, roughness: Array, metallic: Array,
                         normals: Array, viewdirs: Array,
                         incidents_shs: Array, direct_shs: Array,
                         visibility_shs: Array, sample_num: int = 24
                         ) -> Dict[str, Array]:
    """r3dg's relightable per-gaussian render equation (reference:
    externals/r3dg_rasterization/render_equation.cu:55-190
    render_equation_forward_complex): Monte-Carlo integration over a
    Fibonacci hemisphere of incident directions around each normal, with

      * per-gaussian SH *local* incident light, a global SH environment
        (0.5 + direct SH) modulated by a per-gaussian SH visibility
        (0.5 + vis SH, clamped to [0,1]);
      * Disney-style BRDF: Lambertian diffuse (1−m)·base/π and a
        spherical-Gaussian GGX specular D = exp(2/r²·(h·n−1))/(πr²) with
        Schlick Fresnel (F₀ = 0.04(1−m)+base·m) and Smith-Schlick V;
      * transport = light · 2π·(n·i)/S.

    Shapes: base_color [N,3], roughness/metallic [N], normals/viewdirs
    [N,3] (unit, surface→eye), incidents_shs [N,S_i,3] (S_i ≤ 16),
    direct_shs [S_d,3], visibility_shs [N,S_v]. Hand-written CUDA
    fwd/bwd become one vectorized jax function + autodiff.

    Returns {pbr, rgb_d, rgb_s, diffuse_light, accum, incident_dirs,
    incident_lights}.
    """
    from nr3d_lib_tpu.models.embedders import sh_encode

    n = base_color.shape[0]
    # Fibonacci hemisphere in the +z frame (render_equation.cu:90-98)
    i = jnp.arange(sample_num, dtype=base_color.dtype)
    delta = math.pi * (3.0 - math.sqrt(5.0))
    z = 1.0 - 2.0 * i / (2.0 * sample_num - 1.0)
    rad = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    th = delta * i
    local = jnp.stack([jnp.sin(th) * rad, jnp.cos(th) * rad, z], -1)  # [S,3]

    # rotate +z to each normal (the reference's explicit Rodrigues form)
    nx, ny, nz = normals[:, 0], normals[:, 1], normals[:, 2]
    v1, v2 = -ny, nx
    cp = jnp.maximum(nz + 1.0, 1e-7)
    row0 = jnp.stack([1 - v2 * v2 / cp, v1 * v2 / cp, v2], -1)
    row1 = jnp.stack([v1 * v2 / cp, 1 - v1 * v1 / cp, -v1], -1)
    row2 = jnp.stack([-v2, v1, 1 - (v1 * v1 + v2 * v2) / cp], -1)
    rot = jnp.stack([row0, row1, row2], -2)                       # [N,3,3]
    dirs = jnp.einsum("nij,sj->nsi", rot, local)
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-7)      # [N,S,3]

    coef = sh_encode(dirs, 4)                                     # [N,S,16]
    s_i = incidents_shs.shape[1]
    local_light = jnp.maximum(
        jnp.einsum("nsk,nkc->nsc", coef[..., :s_i], incidents_shs), 0.0)
    s_d = direct_shs.shape[0]
    global_light = jnp.maximum(
        0.5 + jnp.einsum("nsk,kc->nsc", coef[..., :s_d], direct_shs), 0.0)
    s_v = visibility_shs.shape[1]
    vis = jnp.clip(0.5 + jnp.einsum("nsk,nk->ns", coef[..., :s_v],
                                    visibility_shs), 0.0, 1.0)
    light = global_light * vis[..., None] + local_light           # [N,S,3]

    v = viewdirs[:, None, :]
    half = dirs + v
    half = half / jnp.maximum(jnp.linalg.norm(half, axis=-1, keepdims=True),
                              1e-7)
    h_d_n = jnp.maximum(jnp.sum(half * normals[:, None], -1), 0.0)
    h_d_o = jnp.maximum(jnp.sum(half * v, -1), 0.0)
    n_d_i = jnp.maximum(jnp.sum(normals[:, None] * dirs, -1), 0.0)
    n_d_o = jnp.maximum(jnp.sum(normals * viewdirs, -1), 0.0)[:, None]

    m = metallic[:, None, None]
    f_d = (1 - m) * base_color[:, None] / math.pi
    r2 = jnp.maximum(roughness ** 2, 1e-7)[:, None]
    D = jnp.exp(2.0 / r2 * (h_d_n - 1.0)) / (r2 * math.pi)
    F0 = 0.04 * (1 - m) + base_color[:, None] * m
    F = F0 + (1 - F0) * (1 - h_d_o[..., None]) ** 5
    k = ((1.0 + roughness) ** 2 / 8.0)[:, None]
    V = (0.5 / jnp.maximum(n_d_i * (1 - k) + k, 1e-7)) \
        * (0.5 / jnp.maximum(n_d_o * (1 - k) + k, 1e-7))
    f_s = D[..., None] * F * V[..., None]

    tmp = (2.0 * math.pi * n_d_i / sample_num)[..., None]
    transport = light * tmp
    diffuse_light = jnp.sum(transport, 1)
    rgb_d = jnp.sum(f_d * transport, 1)
    rgb_s = jnp.sum(f_s * transport, 1)
    accum = jnp.mean(diffuse_light / math.pi + rgb_s, -1)
    return {"pbr": rgb_d + rgb_s, "rgb_d": rgb_d, "rgb_s": rgb_s,
            "diffuse_light": diffuse_light, "accum": accum,
            "incident_dirs": dirs, "incident_lights": light}


def render_equation(base_color: Array, roughness: Array, normals: Array,
                    view_dirs: Array, light_dirs: Array, light_rgb: Array,
                    ambient: float = 0.1) -> Array:
    """Per-gaussian simplified directional-light shading (kept as the cheap
    point-light path; the full reference render equation is
    `render_equation_r3dg`).

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
