"""Tests: native marching tets, DMTet, gaussian splatting, batched accel,
raymarch wrappers, coordinates, gui offline renderer, plot_3d."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _sphere_vol(n, r=0.5):
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    return np.linalg.norm(g, axis=-1) - r


def test_native_marching_tets_watertight():
    from nr3d_lib_tpu.bindings import marching_tets_native

    out = marching_tets_native(_sphere_vol(32), 0.0)
    if out is None:
        pytest.skip("native toolchain unavailable")
    verts, faces = out
    w = verts / 31 * 2 - 1
    r = np.linalg.norm(w, axis=-1)
    assert abs(np.median(r) - 0.5) < 0.01
    edges = {}
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            k = (min(a, b), max(a, b))
            edges[k] = edges.get(k, 0) + 1
    counts = np.asarray(list(edges.values()))
    assert (counts == 2).all(), "mesh must be watertight"
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    nrm = np.cross(v1 - v0, v2 - v0)
    ctr = (v0 + v1 + v2) / 3 - 31 / 2
    assert ((nrm * ctr).sum(-1) > 0).all(), "normals must point outward"


def test_extract_mesh_uses_native():
    from nr3d_lib_tpu.graphics.trianglemesh import extract_mesh

    verts, faces = extract_mesh(
        lambda x: np.linalg.norm(np.asarray(x), axis=-1) - 0.5, resolution=24)
    r = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(r) - 0.5) < 0.05


def test_dmtet_differentiable(rng):
    from nr3d_lib_tpu.models.tetrahedral import DMTet

    dm = DMTet(resolution=12)
    sdf = jnp.linalg.norm(dm.base_verts, axis=-1) - 0.5
    tri_verts, tri_mask, _ = dm(sdf)
    assert bool(tri_mask.any())
    verts, faces = dm.to_mesh(tri_verts, tri_mask)
    r = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(r) - 0.5) < 0.05

    # gradients flow to sdf values (surface moves with sdf)
    def surf_loss(s):
        tv, m, _ = dm(s)
        r = jnp.linalg.norm(tv, axis=-1)
        return jnp.sum(jnp.where(m[..., None], (r - 0.4) ** 2, 0.0))

    g = np.asarray(jax.grad(surf_loss)(sdf))
    assert np.isfinite(g).all() and (np.abs(g) > 0).any()

    # deformation moves vertices
    deform = jnp.zeros_like(dm.base_verts)
    tv2, m2, _ = dm(sdf, deform)
    g2 = jax.grad(lambda d: jnp.sum(dm(sdf, d)[0]))(deform)
    assert np.isfinite(np.asarray(g2)).all()


def test_gaussian_splatting_render(rng):
    from nr3d_lib_tpu.graphics.cameras import look_at
    from nr3d_lib_tpu.graphics.gaussian_splatting import (mark_visible,
                                                          rasterize_gaussians)

    # one red gaussian at origin, one green behind it (occluded)
    means = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    scales = jnp.full((2, 3), 0.1)
    quats = jnp.asarray([[1.0, 0, 0, 0]] * 2)
    opac = jnp.asarray([0.9, 0.9])
    colors = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    c2w = look_at([0, 0, -2.0], [0, 0, 0])
    w2c = np.linalg.inv(np.asarray(c2w))
    intr = jnp.asarray([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1]])
    out = rasterize_gaussians(means, scales, quats, opac, colors,
                              jnp.asarray(w2c), intr, (64, 64))
    center = np.asarray(out["rgb"][32, 32])
    assert center[0] > 0.6 and center[1] < 0.35, f"front gaussian red, got {center}"
    assert float(out["alpha"][32, 32]) > 0.8
    # α=0.9 front at z=2 + 0.09 leaked weight on back at z=3 → ≈2.09
    assert abs(float(out["depth"][32, 32]) - 2.09) < 0.05
    corner = np.asarray(out["rgb"][0, 0])
    assert (corner < 0.05).all(), "background stays bg color"

    vis = mark_visible(means, jnp.asarray(w2c), intr, (64, 64))
    assert bool(vis.all())
    behind = mark_visible(jnp.asarray([[0.0, 0.0, -5.0]]), jnp.asarray(w2c),
                          intr, (64, 64))
    assert not bool(behind[0])

    # differentiable wrt means
    g = jax.grad(lambda m: jnp.sum(rasterize_gaussians(
        m, scales, quats, opac, colors, jnp.asarray(w2c), intr, (16, 16))["rgb"]))(means)
    assert np.isfinite(np.asarray(g)).all()


def test_render_equation():
    from nr3d_lib_tpu.graphics.gaussian_splatting import render_equation

    n = jnp.asarray([[0.0, 0.0, 1.0]])
    base = jnp.asarray([[0.5, 0.5, 0.5]])
    rough = jnp.asarray([0.5])
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    head_on = render_equation(base, rough, n, v, jnp.asarray([[0.0, 0, 1.0]]),
                              jnp.ones(3))
    grazing = render_equation(base, rough, n, v, jnp.asarray([[1.0, 0, 0.01]]),
                              jnp.ones(3))
    assert float(head_on.sum()) > float(grazing.sum())


def test_batched_occgrid_accel(rng):
    from nr3d_lib_tpu.models.accelerations.occgrid_batched import (
        OccGridAccelBatched, OccGridAccelDynamic)

    accel = OccGridAccelBatched(2, resolution=8, occ_thre=0.5,
                                step_size=2 / 32, max_steps_per_ray=64)

    def qfn(x, bidx):
        # instance 0: sphere r=.5; instance 1: empty
        inside = (jnp.linalg.norm(x, axis=-1) < 0.5) & (bidx == 0)
        return inside.astype(jnp.float32)

    for i in range(3):
        accel.occ.step_update(jax.random.key(i), qfn)
    # also decay: instance 1 should clear after updates
    occ = np.asarray(accel.occ.occ())
    assert occ[0].any()
    o = jnp.asarray([[-2.0, 0.0, 0.0]] * 2)
    d = jnp.asarray([[1.0, 0.0, 0.0]] * 2)
    ret = accel.ray_march(jnp.asarray([0, 1]), o, d, jnp.zeros(2), jnp.full((2,), 4.0))
    m = np.asarray(ret.mask)
    assert m[0].sum() > 0
    assert m[1].sum() <= m[0].sum()

    dyn = OccGridAccelDynamic(3, resolution=8)
    k = dyn.time_to_key(jnp.asarray([-1.0, 0.1, 1.0]))
    np.testing.assert_array_equal(np.asarray(k), [0, 1, 2])


def test_raymarch_wrapper_and_packed():
    from nr3d_lib_tpu.graphics.raymarch import occgrid_raymarch

    occ = jnp.ones((8, 8, 8), bool)
    o = jnp.asarray([[-2.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    ret = occgrid_raymarch(occ, o, d, jnp.zeros(1), jnp.full((1,), 4.0),
                           n_steps=32, step_size=0.125)
    assert int(ret.num_hit_samples) > 0
    t_flat, dt_flat, ridx = ret.to_packed()
    n_valid = int((np.asarray(ridx) < 1).sum())
    assert n_valid == int(ret.num_hit_samples)
    pos = ret.positions(o, d)
    assert pos.shape == (1, 32, 3)


def test_coordinates_conversions():
    from nr3d_lib_tpu.coordinates import opencv_to_opengl, opengl_to_opencv

    c2w = jnp.eye(4)
    gl = opencv_to_opengl(c2w)
    # forward (+z cv) becomes -z in gl convention: third column flips y,z
    np.testing.assert_allclose(np.asarray(gl[:3, 2]), [0, 0, -1], atol=1e-7)
    back = opengl_to_opencv(gl)
    np.testing.assert_allclose(np.asarray(back), np.asarray(c2w), atol=1e-7)


def test_offline_renderer_gui():
    from nr3d_lib_tpu.gui import NeuralRenderer
    from nr3d_lib_tpu.models.model_base import LoTDNeRFModel

    model = LoTDNeRFModel(
        field_cfg={"encoding_cfg": {"lotd_cfg": {
            "lod_res": [8], "lod_n_feats": 2, "lod_types": "Dense"}},
            "density_decoder_cfg": {"D": 1, "W": 8},
            "radiance_cfg": {"D": 1, "W": 8}},
        accel_cfg={"resolution": 8, "max_steps_per_ray": 32, "step_size": 2 / 16})
    model.populate()
    r = NeuralRenderer(model, hw=(16, 16), ray_chunk=128)
    from nr3d_lib_tpu.graphics.cameras import look_at

    images = r.render(look_at([0, 0, 2.5], [0, 0, 0]))
    assert images["rgb_volume"].shape == (16, 16, 3)
    assert images["depth_volume"].shape == (16, 16)
    assert np.isfinite(images["rgb_volume"]).all()


def test_plot_3d_linesets():
    from nr3d_lib_tpu.plot.plot_3d import camera_frustum_lines, occgrid_box_lines

    pts, segs = camera_frustum_lines(np.eye(4), np.asarray(
        [[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]]), (64, 64))
    assert pts.shape == (5, 3) and segs.shape == (8, 2)
    occ = np.zeros((4, 4, 4), bool)
    occ[1, 2, 3] = True
    pts2, segs2 = occgrid_box_lines(occ)
    assert pts2.shape == (8, 3) and segs2.shape == (12, 2)
