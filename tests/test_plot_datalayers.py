"""Plot breadth + GUI datalayers (reference: nr3d_lib/plot/,
nr3d_lib/gui/datalayers/)."""

import os

import jax.numpy as jnp
import numpy as np


def test_plot_basic_breadth():
    from nr3d_lib_tpu.plot import (color_depth, color_error_map,
                                   colorize_normals, gallery, overlay_mask)

    img = np.zeros((8, 8, 3), np.uint8)
    mask = np.zeros((8, 8), bool)
    mask[2:4, 2:4] = True
    out = overlay_mask(img, mask, color=(255, 0, 0), alpha=1.0)
    assert out.dtype == np.uint8
    assert (out[2, 2] == [255, 0, 0]).all() and (out[0, 0] == 0).all()

    n = colorize_normals(np.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]]))
    assert n.shape == (2, 3) and n[0, 2] == 255 and n[1, 2] == 0

    e = color_error_map(np.asarray([[-1.0, 0.0, 1.0]]))
    assert e.shape == (1, 3, 3)
    d = color_depth(np.ones((4, 4)))
    assert d.shape == (4, 4, 3)
    g = gallery([np.zeros((4, 4, 3)), np.ones((4, 4, 3))], ncols=2)
    assert g.shape[0] == 4


def test_plot_3d_linesets():
    from nr3d_lib_tpu.plot import (merge_linesets, obb_lines,
                                   trajectory_lines)

    pts, segs = obb_lines(np.eye(3, 4), (2.0, 2.0, 2.0))
    assert pts.shape == (8, 3) and segs.shape == (12, 2)
    assert np.allclose(np.abs(pts).max(), 1.0)
    # translated box
    m = np.eye(3, 4)
    m[:, 3] = [5.0, 0, 0]
    pts2, _ = obb_lines(m, (2.0, 2.0, 2.0))
    assert np.allclose(pts2.mean(0), [5.0, 0, 0], atol=1e-6)

    tp, ts = trajectory_lines(np.zeros((5, 3)))
    assert ts.shape == (4, 2)
    mp, ms = merge_linesets([(pts, segs), (pts2, segs)])
    assert len(mp) == 16 and ms.max() == 15


def test_datalayers_and_ply_export(tmp_path):
    from nr3d_lib_tpu.gui_datalayers import (aabb_datalayer, camera_datalayer,
                                             forest_datalayer,
                                             occgrid_datalayer,
                                             save_linesets_ply)
    from nr3d_lib_tpu.models.accelerations.occgrid_accel import OccGridAccel
    from nr3d_lib_tpu.models.accelerations.occgrid_forest import (
        OccGridAccelForest)
    from nr3d_lib_tpu.models.spatial.aabb import AABBSpace
    from nr3d_lib_tpu.models.spatial.forest import ForestBlockSpace

    accel = OccGridAccel(space=AABBSpace(), resolution=(4, 4, 4))
    accel.occ.val_grid[...] = jnp.ones((4, 4, 4)) * 0.5
    layer = occgrid_datalayer(accel)
    assert layer["points"].shape[1] == 3 and len(layer["edges"]) > 0

    sp = ForestBlockSpace(resolution=(2, 1, 1), origin=(0, 0, 0),
                          block_size=1.0)
    sp.populate_from_corners(np.asarray([[0, 0, 0], [1, 0, 0]]))
    fa = OccGridAccelForest(sp, resolution=(2, 2, 2))
    fa.occ.val_grid[...] = jnp.ones((2, 2, 2, 2)) * 0.5
    layers = forest_datalayer(sp, fa)
    assert len(layers) == 2
    assert len(layers[0]["points"]) == 2 * 8          # two block boxes

    cam = camera_datalayer([np.eye(4)], np.asarray(
        [[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]]), (64, 64))
    assert cam["points"].shape == (5, 3)

    ab = aabb_datalayer(np.asarray([[-1.0, -1, -1], [1, 1, 1]]))
    path = os.path.join(tmp_path, "layers.ply")
    save_linesets_ply(path, [layer, cam, ab] + layers)
    txt = open(path).read()
    assert txt.startswith("ply") and "element edge" in txt


def test_sdf_slice_and_segment_drawing():
    """sdf_slice_image marks the zero level set; draw_segments_2d paints
    in-bounds pixels and clips out-of-bounds ones."""
    import numpy as np

    from nr3d_lib_tpu.plot import draw_segments_2d, sdf_slice_image

    sl = sdf_slice_image(lambda p: np.linalg.norm(p, axis=-1) - 0.5,
                         resolution=64)
    assert sl.shape == (64, 64, 3) and sl.dtype == np.uint8
    dark = (sl.sum(-1) < 90)
    assert 20 < dark.sum() < 500          # a ring, not empty/everything

    img = np.zeros((32, 32, 3), np.uint8)
    out = draw_segments_2d(img, np.asarray([[2.0, 2.0], [100.0, -5.0]]),
                           np.asarray([[29.0, 2.0], [120.0, -9.0]]),
                           color=(255, 0, 0))
    assert (out[2, 2:30, 0] == 255).all()          # horizontal line painted
    assert out.sum() == int((out[..., 0] == 255).sum()) * 255  # red only
    assert (img == 0).all()                         # input untouched


def test_plot_2d_annotations():
    """Round-5 plot breadth (reference plot_2d.py:20-160): labeled boxes,
    bool/int masks, patches — incl. edge clipping."""
    import numpy as np

    from nr3d_lib_tpu.plot import (choose_contrast_color, draw_2dbox_labeled,
                                   draw_bool_mask, draw_int_mask, draw_patch,
                                   get_n_ind_colors)

    im = np.zeros((64, 64, 3), np.uint8)
    cols = get_n_ind_colors(8)
    assert cols.shape == (8, 3) and len({tuple(c) for c in cols}) == 8
    assert choose_contrast_color((255, 255, 255)) == (0, 0, 0)
    assert choose_contrast_color((10, 10, 10)) == (255, 255, 255)

    out = draw_2dbox_labeled(im, 32, 32, 20, 16, color=(0, 255, 0),
                             label="car", label2="0.93")
    assert out.sum() > 0 and out.shape == im.shape
    # mask partially off-image (negative offset) must clip, not crash
    m = np.ones((16, 16), bool)
    out2 = draw_bool_mask(im, m, (255, 0, 0), 0.5, h0=-8, w0=56)
    assert out2[:8, 56:, 0].all() and out2[8:, :, 0].sum() == 0
    # fully off-image is a no-op
    assert (draw_bool_mask(im, m, (255, 0, 0), 0.5, h0=100, w0=0) == im).all()

    ids = np.asarray([[0, 1], [2, 3]])
    out3 = draw_int_mask(im, ids, h0=10, w0=10)
    assert (out3[10:12, 10:12] != 0).any()
    patch = np.full((8, 8, 3), 200, np.uint8)
    out4 = draw_patch(im, patch, 0.5, h0=60, w0=60)
    assert (out4[60:, 60:] == 100).all()
