"""Tile-binned gaussian rasterizer (VERDICT round-1 item #7; reference:
externals/r3dg_rasterization/cuda_rasterizer/rasterizer_impl.cu tile
pipeline): parity vs the dense oracle on small scenes, scaling smoke at
50k gaussians, SH colors, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _scene(n, key, spread=1.0, scale=0.05):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    means = jax.random.uniform(k1, (n, 3), minval=-spread, maxval=spread)
    scales = jnp.full((n, 3), scale) * jax.random.uniform(
        k2, (n, 1), minval=0.5, maxval=1.5)
    quats = jax.random.normal(k3, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jax.random.uniform(k4, (n,), minval=0.3, maxval=0.9)
    colors = jax.random.uniform(jax.random.key(7), (n, 3))
    return means, scales, quats, opac, colors


def _camera():
    from nr3d_lib_tpu.graphics.cameras import look_at

    c2w = look_at([0, 0, -4.0], [0, 0, 0])
    w2c = jnp.asarray(np.linalg.inv(np.asarray(c2w)))
    intr = jnp.asarray([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1]])
    return w2c, intr


def test_tiled_matches_dense():
    from nr3d_lib_tpu.graphics.gaussian_splatting import (
        rasterize_gaussians, rasterize_gaussians_tiled)

    means, scales, quats, opac, colors = _scene(64, jax.random.key(0))
    w2c, intr = _camera()
    hw = (64, 64)
    out_d = rasterize_gaussians(means, scales, quats, opac, colors,
                                w2c, intr, hw)
    out_t = rasterize_gaussians_tiled(means, scales, quats, opac, colors,
                                      w2c, intr, hw, tile=16,
                                      tiles_per_gaussian=16,
                                      tile_capacity=64)
    assert int(out_t["n_dropped_pairs"]) == 0
    np.testing.assert_allclose(np.asarray(out_t["rgb"]),
                               np.asarray(out_d["rgb"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_t["alpha"]),
                               np.asarray(out_d["alpha"]), atol=2e-3)
    # depth only where something is hit
    m = np.asarray(out_d["alpha"]) > 0.1
    np.testing.assert_allclose(np.asarray(out_t["depth"])[m],
                               np.asarray(out_d["depth"])[m], rtol=0.05)


def test_tiled_nonsquare_and_odd_size():
    from nr3d_lib_tpu.graphics.gaussian_splatting import (
        rasterize_gaussians, rasterize_gaussians_tiled)

    means, scales, quats, opac, colors = _scene(32, jax.random.key(1))
    w2c, intr = _camera()
    hw = (50, 70)   # not multiples of the tile size
    out_d = rasterize_gaussians(means, scales, quats, opac, colors,
                                w2c, intr, hw)
    out_t = rasterize_gaussians_tiled(means, scales, quats, opac, colors,
                                      w2c, intr, hw, tile_capacity=64)
    assert out_t["rgb"].shape == (50, 70, 3)
    np.testing.assert_allclose(np.asarray(out_t["rgb"]),
                               np.asarray(out_d["rgb"]), atol=2e-3)


def test_tiled_scale_smoke_50k():
    """50k gaussians at 128² on CPU — the dense path would need 0.8G
    pair-evals; tiled runs T·P·K ≈ 17M."""
    from nr3d_lib_tpu.graphics.gaussian_splatting import (
        rasterize_gaussians_tiled)

    means, scales, quats, opac, colors = _scene(50_000, jax.random.key(2),
                                                spread=1.5, scale=0.02)
    w2c, intr = _camera()
    out = jax.jit(lambda *a: rasterize_gaussians_tiled(
        *a, w2c, intr, (128, 128), tile_capacity=128))(
            means, scales, quats, opac, colors)
    rgb = np.asarray(out["rgb"])
    assert rgb.shape == (128, 128, 3) and np.isfinite(rgb).all()
    assert float(out["alpha"].max()) > 0.5, "a dense cloud must hit pixels"


def test_tiled_gradients():
    from nr3d_lib_tpu.graphics.gaussian_splatting import (
        rasterize_gaussians_tiled)

    means, scales, quats, opac, colors = _scene(32, jax.random.key(3))
    w2c, intr = _camera()

    def loss(m, s, o, c):
        out = rasterize_gaussians_tiled(m, s, quats, o, c, w2c, intr,
                                        (32, 32), tile_capacity=64)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["alpha"])

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, opac, colors)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
    assert float(sum(jnp.abs(x).sum() for x in g)) > 0


def test_tiled_capacity_truncation_reported():
    from nr3d_lib_tpu.graphics.gaussian_splatting import (
        rasterize_gaussians_tiled)

    # all gaussians piled on one tile with capacity 8 → truncation reported
    means = jnp.zeros((64, 3)).at[:, 2].set(
        jnp.linspace(-0.2, 0.2, 64))
    scales = jnp.full((64, 3), 0.02)
    quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (64, 1))
    opac = jnp.full((64,), 0.5)
    colors = jnp.ones((64, 3))
    w2c, intr = _camera()
    out = rasterize_gaussians_tiled(means, scales, quats, opac, colors,
                                    w2c, intr, (64, 64), tile_capacity=8)
    assert int(out["n_dropped_pairs"]) > 0
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_sh_colors():
    from nr3d_lib_tpu.graphics.gaussian_splatting import eval_sh_colors

    n = 16
    shs = jax.random.normal(jax.random.key(0), (n, 9, 3)) * 0.2
    dirs = jax.random.normal(jax.random.key(1), (n, 3))
    rgb = eval_sh_colors(shs, dirs)
    assert rgb.shape == (n, 3) and float(rgb.min()) >= 0.0
    # view dependence: rotating the view changes the color
    rgb2 = eval_sh_colors(shs, -dirs)
    assert not np.allclose(np.asarray(rgb), np.asarray(rgb2))
    # DC-only is view-independent
    rgb_dc = eval_sh_colors(shs[:, :1], dirs)
    rgb_dc2 = eval_sh_colors(shs[:, :1], -dirs)
    np.testing.assert_allclose(np.asarray(rgb_dc), np.asarray(rgb_dc2),
                               atol=1e-6)


def test_render_equation_r3dg():
    """Full r3dg render equation (reference: render_equation.cu:55):
    energy scales with light, metals kill diffuse, visibility gates the
    global term, and everything differentiates."""
    import jax

    from nr3d_lib_tpu.graphics.gaussian_splatting import render_equation_r3dg

    n = 8
    k = jax.random.key(0)
    ks = jax.random.split(k, 6)
    base = jax.random.uniform(ks[0], (n, 3), minval=0.2, maxval=0.8)
    rough = jnp.full((n,), 0.4)
    metal = jnp.zeros((n,))
    normals = jnp.tile(jnp.asarray([[0.0, 0, 1.0]]), (n, 1))
    view = jnp.tile(jnp.asarray([[0.0, 0, 1.0]]), (n, 1))
    inc_shs = jnp.zeros((n, 16, 3))
    direct = jnp.zeros((9, 3))
    vis = jnp.zeros((n, 9))

    out = render_equation_r3dg(base, rough, metal, normals, view,
                               inc_shs, direct, vis)
    assert out["pbr"].shape == (n, 3)
    assert np.isfinite(np.asarray(out["pbr"])).all()
    # ambient-only (0.5 global, 0.5 vis): diffuse ≈ base·0.25·(π-weighted);
    # doubling the global light doubles the diffuse
    out2 = render_equation_r3dg(base, rough, metal, normals, view,
                                inc_shs, direct + jnp.asarray(
                                    [[0.5 / 0.28209479, 0.5 / 0.28209479,
                                      0.5 / 0.28209479]] + [[0, 0, 0]] * 8),
                                vis)
    ratio = np.asarray(out2["rgb_d"] / np.maximum(np.asarray(out["rgb_d"]),
                                                  1e-9))
    np.testing.assert_allclose(ratio, 2.0, rtol=0.05)
    # full metal → no diffuse
    out_m = render_equation_r3dg(base, rough, jnp.ones((n,)), normals, view,
                                 inc_shs, direct, vis)
    np.testing.assert_allclose(np.asarray(out_m["rgb_d"]), 0.0, atol=1e-7)
    # zero visibility + no local light → dark (DC term pushed below clamp)
    out_v0 = render_equation_r3dg(base, rough, metal, normals, view, inc_shs,
                                  direct, vis.at[:, 0].set(-10.0))
    assert float(out_v0["pbr"].sum()) < float(out["pbr"].sum()) * 0.1

    g = jax.grad(lambda b: jnp.sum(render_equation_r3dg(
        b, rough, metal, normals, view, inc_shs, direct, vis)["pbr"]))(base)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_pallas_blend_matches_xla():
    """The VMEM-local Pallas tile blend (round-4) against the XLA blend —
    same math, ≤2e-5 (Hillis-Steele scan order vs cumprod)."""
    from jax.experimental.pallas import tpu as pltpu

    from nr3d_lib_tpu.graphics.gaussian_splatting import (
        rasterize_gaussians_tiled)

    means, scales, quats, opac, cols = _scene(3000, jax.random.key(3),
                                              scale=0.05)
    w2c, intr = _camera()
    hw = (64, 96)
    kw = dict(tile_capacity=128, tiles_per_gaussian=16)
    r_x = rasterize_gaussians_tiled(means, scales, quats, opac, cols,
                                    w2c, intr, hw, **kw)
    with pltpu.force_tpu_interpret_mode():
        r_p = rasterize_gaussians_tiled(means, scales, quats, opac, cols,
                                        w2c, intr, hw,
                                        blend_backend="interpret", **kw)
    for k in ("rgb", "alpha", "depth"):
        np.testing.assert_allclose(np.asarray(r_p[k]), np.asarray(r_x[k]),
                                   atol=2e-5, rtol=1e-4)


def test_pallas_blend_gradients_match_xla():
    """Round-5: the Pallas blend's custom_vjp (`_blend_tile_bwd_kernel` —
    reference r3dg cuda_rasterizer/backward.cu renderCUDA) produces the
    same gradients wrt every gaussian parameter as autodiff through the
    XLA blend."""
    from jax.experimental.pallas import tpu as pltpu

    from nr3d_lib_tpu.graphics.gaussian_splatting import (
        rasterize_gaussians_tiled)

    means, scales, quats, opac, cols = _scene(800, jax.random.key(5),
                                              scale=0.06)
    w2c, intr = _camera()
    hw = (48, 48)
    kw = dict(tile_capacity=64, tiles_per_gaussian=16)
    gt = jax.random.uniform(jax.random.key(9), (hw[0], hw[1], 3))

    def loss(backend, m, s, q, o, c):
        out = rasterize_gaussians_tiled(m, s, q, o, c, w2c, intr, hw,
                                        blend_backend=backend, **kw)
        return (jnp.mean((out["rgb"] - gt) ** 2)
                + 0.1 * jnp.mean(out["alpha"])
                + 0.01 * jnp.mean(out["depth"]))

    g_x = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, cols)
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(lambda *a: loss("interpret", *a),
                       argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, opac, cols)
    names = ("means", "scales", "quats", "opac", "cols")
    for nm, a, b in zip(names, g_p, g_x):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=5e-5, err_msg=nm)
