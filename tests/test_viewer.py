"""Interactive HTTP viewer: page, layer listing, and frame rendering
(reference GUI equivalent — nr3d_lib/gui/; here a browser orbit UI over
HTTP, see nr3d_lib_tpu/viewer.py)."""

import json
import urllib.request

import numpy as np


def _tiny_neus():
    from nr3d_lib_tpu.models.model_base import LoTDNeuSModel

    m = LoTDNeuSModel(
        field_cfg={"surface_cfg": {
            "encoding_cfg": {"lotd_cfg": {"lod_res": [8], "lod_n_feats": 2,
                                          "lod_types": "Dense"}},
            "decoder_cfg": {"D": 1, "W": 16}},
            "radiance_cfg": {"D": 1, "W": 16}},
        accel_cfg={"resolution": 8, "max_steps_per_ray": 32,
                   "step_size": 2 / 16})
    m.populate()
    return m


def test_viewer_routes():
    from nr3d_lib_tpu.viewer import InteractiveViewer

    v = InteractiveViewer(_tiny_neus(), hw=(24, 24), host="127.0.0.1")
    url = v.start()
    try:
        page = urllib.request.urlopen(url + "/", timeout=120).read()
        assert b"nr3d_lib_tpu viewer" in page

        layers = json.loads(
            urllib.request.urlopen(url + "/layers", timeout=600).read())
        assert layers and layers[0].startswith("rgb")

        for layer in (layers[0], "depth_volume", "bogus"):
            r = urllib.request.urlopen(
                url + f"/render?theta=0.7&phi=0.2&radius=3&layer={layer}",
                timeout=600)
            png = r.read()
            assert r.headers["Content-Type"] == "image/png"
            assert png[:8] == b"\x89PNG\r\n\x1a\n"     # magic incl. fallback

        missing = urllib.request.urlopen(url + "/nope", timeout=60)
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        v.stop()


def test_layer_conversion():
    from nr3d_lib_tpu.viewer import _to_uint8_layer

    rgb = _to_uint8_layer(np.random.rand(4, 4, 3).astype(np.float32))
    assert rgb.shape == (4, 4, 3) and rgb.dtype == np.uint8
    depth = _to_uint8_layer(np.linspace(0, 9, 16).reshape(4, 4))
    assert depth.shape == (4, 4, 3)
    assert depth.min() == 0 and depth.max() == 255     # normalized
    normals = _to_uint8_layer(np.full((4, 4, 3), -1.0, np.float32))
    assert (normals == 0).all()                        # [-1,1] remapped


def test_viewer_controls_dynamic_model():
    """Scene-condition sliders (ts for a dynamic model): the /controls
    route lists them, and /render forwards c_<name> query params as
    per-ray conditions (gui.NeuralRenderer ray_extras)."""
    import jax.numpy as jnp

    from nr3d_lib_tpu.models.model_families import EmerNeRFModel
    from nr3d_lib_tpu.viewer import InteractiveViewer

    m = EmerNeRFModel(
        field_cfg={"static_cfg": {"lotd_cfg": {
            "lod_res": [8], "lod_n_feats": 2, "lod_types": "Dense"}},
            "dynamic_permuto_cfg": {"res_list": [4.0, 8.0], "n_feats": 2,
                                    "log2_hashmap_size": 10}},
        accel_cfg={"resolution": (8, 8, 8)}, n_time_keys=4,
        n_march_steps=16)
    m.populate()
    v = InteractiveViewer(
        m, hw=(16, 16), host="127.0.0.1",
        controls={"ts": {"min": -1, "max": 1, "step": 0.1, "value": 0.0}})
    url = v.start()
    try:
        ctrls = json.loads(
            urllib.request.urlopen(url + "/controls", timeout=60).read())
        assert "ts" in ctrls and ctrls["ts"]["max"] == 1.0

        r = urllib.request.urlopen(
            url + "/render?theta=0.7&phi=0.2&radius=3&c_ts=0.5",
            timeout=600)
        assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        v.stop()


def test_viewer_overlay_datalayer():
    """Overlay painting: /render?overlay=1 projects the configured line
    sets into the frame (pixels differ from the clean render)."""
    import io

    from nr3d_lib_tpu.gui_datalayers import aabb_datalayer
    from nr3d_lib_tpu.viewer import InteractiveViewer

    v = InteractiveViewer(_tiny_neus(), hw=(32, 32), host="127.0.0.1",
                          overlays=[aabb_datalayer(((-1, -1, -1),
                                                    (1, 1, 1)))])
    url = v.start()
    try:
        base = url + "/render?theta=0.7&phi=0.2&radius=3"
        clean = urllib.request.urlopen(base + "&overlay=0",
                                       timeout=600).read()
        over = urllib.request.urlopen(base + "&overlay=1",
                                      timeout=600).read()
        assert clean[:8] == over[:8] == b"\x89PNG\r\n\x1a\n"
        assert clean != over, "overlay did not change the frame"
    finally:
        v.stop()
