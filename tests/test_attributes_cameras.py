"""Attributes/camera depth (VERDICT round-1 item #8; reference:
attributes/attr.py:38-247, transform.py:62-385, camera_param.py:62-538):
pose-refinement gradcheck through transform attrs, lift/project round-trips
for every camera model, fisheye undistort, robust frustum culling, attr
tree utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ----------------------------------------------------------------- SE3 / SO3
def test_exp_se3_identity_and_known_rotation():
    from nr3d_lib_tpu.models.attributes import TransformExpSE3

    t = TransformExpSE3.identity()
    np.testing.assert_allclose(np.asarray(t.mat_4x4()), np.eye(4), atol=1e-6)

    # θ=π/2 about z: x→y
    t = TransformExpSE3(jnp.asarray([0.0, 0, 1.0]), jnp.zeros(3),
                        jnp.asarray(np.pi / 2))
    p = t.transform(jnp.asarray([1.0, 0, 0]))
    np.testing.assert_allclose(np.asarray(p), [0, 1, 0], atol=1e-6)

    # pure translation: w=0, v=d, θ=1 → translate by d
    t = TransformExpSE3(jnp.zeros(3), jnp.asarray([1.0, 2, 3]),
                        jnp.asarray(1.0))
    p = t.transform(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(p), [1, 2, 3], atol=1e-6)


def test_pose_refinement_gradcheck_exp_se3():
    """Optimize an ExpSE3 delta pose to align two point clouds — the
    reference's pose-refinement use (iNeRF-style)."""
    from nr3d_lib_tpu.models.attributes import TransformExpSE3, TransformRT

    gt = TransformRT(jnp.asarray([0.9689, 0.1236, 0.1726, 0.1116]),
                     jnp.asarray([0.1, -0.2, 0.05]))
    gt = TransformRT(gt.rot / jnp.linalg.norm(gt.rot), gt.trans)
    pts = jax.random.normal(jax.random.key(0), (64, 3))
    target = gt.transform(pts)

    def loss_fn(params):
        t = TransformExpSE3(params["w"], params["v"], params["theta"])
        return jnp.mean((t.transform(pts) - target) ** 2)

    params = {"w": jnp.zeros(3), "v": jnp.zeros(3), "theta": jnp.asarray(0.1)}
    # finite, nonzero grads at init (the refinement direction exists)
    g = jax.grad(loss_fn)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    l0 = float(loss_fn(params))
    for _ in range(200):
        g = jax.grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p, gg: p - 0.5 * gg, params, g)
    assert float(loss_fn(params)) < l0 * 1e-2


def test_transform_interp1d_and_inv():
    from nr3d_lib_tpu.models.attributes import TransformRT

    a = TransformRT(jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3))
    q90 = jnp.asarray([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    b = TransformRT(q90, jnp.asarray([2.0, 0, 0]))
    mid = a.interp1d(b, 0.5)
    # half the rotation (45° about z), half the translation
    p = mid.transform(jnp.asarray([1.0, 0, 0]))
    np.testing.assert_allclose(np.asarray(p),
                               [np.cos(np.pi / 4) + 1.0, np.sin(np.pi / 4), 0],
                               atol=1e-5)
    # inv ∘ fwd = id
    rt = b.inv()
    np.testing.assert_allclose(
        np.asarray(rt.transform(b.transform(jnp.asarray([0.3, -0.7, 1.1])))),
        [0.3, -0.7, 1.1], atol=1e-5)


# -------------------------------------------------------------------- attrs
def test_attr_utilities_index_stack_interp():
    from nr3d_lib_tpu.models.attributes import (
        RotationQuaternion, TransformRT, attr_concat, attr_index,
        attr_interp1d, attr_stack)

    qs = [RotationQuaternion(jnp.asarray([1.0, 0, 0, 0])),
          RotationQuaternion(jnp.asarray(
              [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]))]
    batch = attr_stack(qs)
    assert batch.q.shape == (2, 4)
    one = attr_index(batch, 1)
    np.testing.assert_allclose(np.asarray(one.q), np.asarray(qs[1].q))
    cat = attr_concat([batch, batch])
    assert cat.q.shape == (4, 4)

    # interp1d dispatches to slerp for rotations (norm stays 1)
    mid = attr_interp1d(qs[0], qs[1], 0.5)
    np.testing.assert_allclose(float(jnp.linalg.norm(mid.q)), 1.0, atol=1e-6)

    # nested containers recurse
    a = {"pose": TransformRT(qs[0].q, jnp.zeros(3)), "t": jnp.asarray(0.0)}
    b = {"pose": TransformRT(qs[1].q, jnp.asarray([2.0, 0, 0])), "t": jnp.asarray(1.0)}
    m = attr_interp1d(a, b, 0.5)
    np.testing.assert_allclose(float(m["t"]), 0.5)
    np.testing.assert_allclose(np.asarray(m["pose"].trans), [1.0, 0, 0],
                               atol=1e-6)


# ------------------------------------------------------------------- cameras
CAMS = {}


def _cams():
    from nr3d_lib_tpu.models.attributes import (
        FisheyeCameraIntrinsics, OpenCVCameraIntrinsics, OrthoCameraIntrinsics,
        PinholeCameraHWF, PinholeCameraHWFExp, PinholeCameraHWFRatio,
        PinholeCameraIntrinsics, PinholeCameraMatHW)

    f = jnp.asarray(100.0)
    c = jnp.asarray(64.0)
    return {
        "pinhole": PinholeCameraIntrinsics(f, f * 1.1, c, c, 128, 128),
        "mat_hw": PinholeCameraMatHW(jnp.asarray(
            [[100.0, 0.0, 64.0], [0.0, 110.0, 64.0], [0.0, 0.0, 1.0]]),
            128, 128),
        "hwf": PinholeCameraHWF(f, c, c, 128, 128),
        "hwf_ratio": PinholeCameraHWFRatio(jnp.asarray(100.0 / 128),
                                           jnp.asarray(110.0 / 128),
                                           c, c, 128, 128),
        "hwf_exp": PinholeCameraHWFExp(jnp.log(f), jnp.log(f * 1.1),
                                       c, c, 128, 128),
        "opencv": OpenCVCameraIntrinsics(
            f, f, c, c, 128, 128,
            dist=jnp.asarray([0.1, -0.05, 0.001, -0.002, 0.01])),
        "fisheye": FisheyeCameraIntrinsics(
            f, f, c, c, 128, 128,
            dist=jnp.asarray([0.05, -0.01, 0.002, -0.001])),
        "ortho": OrthoCameraIntrinsics(f, f, c, c, 128, 128),
    }


@pytest.mark.parametrize("name", ["pinhole", "mat_hw", "hwf", "hwf_ratio",
                                  "hwf_exp", "opencv", "fisheye", "ortho"])
def test_camera_lift_project_roundtrip(name):
    """VERDICT #8 'done' criterion: lift/project round-trip for all camera
    models."""
    cam = _cams()[name]
    uv = jnp.asarray([[20.0, 30.0], [64.0, 64.0], [100.0, 90.0]])
    depth = jnp.asarray([1.0, 2.5, 4.0])
    x_cam = cam.lift(uv, depth)
    uv2, z2 = cam.proj(x_cam)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-2)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(depth), atol=1e-4)


def test_intrinsics_refinement_grads():
    """Gradients flow through the refinement parameterizations."""
    from nr3d_lib_tpu.models.attributes import PinholeCameraHWFExp

    uv_obs = jnp.asarray([[30.0, 40.0]])

    def loss_fn(logf):
        cam = PinholeCameraHWFExp(logf, logf, jnp.asarray(64.0),
                                  jnp.asarray(64.0), 128, 128)
        x = cam.lift(jnp.asarray([[32.0, 40.0]]), jnp.asarray([2.0]))
        uv, _ = cam.proj(x + jnp.asarray([0.01, 0.0, 0.0]))
        return jnp.sum((uv - uv_obs) ** 2)

    g = jax.grad(loss_fn)(jnp.asarray(4.6))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_fisheye_undistort_inverts_distort():
    from nr3d_lib_tpu.graphics.cameras import fisheye_distort, fisheye_undistort

    dist = jnp.asarray([0.08, -0.02, 0.003, -0.001])
    xn = jax.random.uniform(jax.random.key(0), (64, 2), minval=-0.8,
                            maxval=0.8)
    xd = fisheye_distort(xn, dist)
    xn2 = fisheye_undistort(xd, dist)
    np.testing.assert_allclose(np.asarray(xn2), np.asarray(xn), atol=1e-5)


def test_frustum_culling_cases():
    from nr3d_lib_tpu.graphics.cameras import frustum_culling_aabb, look_at

    intr = jnp.asarray([[100.0, 0, 64.0], [0, 100.0, 64.0], [0, 0, 1]])
    hw = (128, 128)
    c2w = look_at([0, 0, -4.0], [0, 0, 0])   # camera at -4z looking at origin

    def box(center, half=0.5):
        c = np.asarray(center, np.float32)
        return jnp.asarray([c - half, c + half])

    vis = lambda b, **kw: bool(frustum_culling_aabb(intr, c2w, hw, b,
                                                    far=100.0, **kw))
    assert vis(box([0, 0, 0]))                    # dead center
    assert not vis(box([0, 0, -6.0]))             # behind the camera
    assert not vis(box([50.0, 0, 0]))             # far off to the side
    assert vis(box([0, 0, 10.0]))                 # in front, within far
    assert not vis(box([0, 0, 200.0]))            # beyond far plane
    # straddling: huge box whose corners all project outside yet contains
    # the whole frustum — the naive corner-projection test culls this
    assert vis(box([0, 0, 0], half=30.0))
    # slightly off-screen but overlapping the frustum edge
    assert vis(box([2.6, 0, 0], half=0.5))        # at z=4: u≈cx+65, edge
    # batched c2w
    c2ws = jnp.stack([c2w, look_at([0, 0, 4.0], [0, 0, 8.0])])
    out = frustum_culling_aabb(intr, c2ws, hw, box([0, 0, 0]))
    assert out.shape == (2,) and bool(out[0]) and not bool(out[1])


def test_camera_paths_breadth():
    """All four reference path generators (camera_paths.py:31-352)."""
    import jax.numpy as jnp
    import numpy as np
    from nr3d_lib_tpu.graphics.cameras import (
        path_interpolation, path_small_circle, path_spherical_spiral,
        smoothed_motion_interpolation, spherical_camera_path)

    s = smoothed_motion_interpolation(1.0, 16)
    assert s[0] == 0.0 and abs(s[-1] - 1.0) < 1e-9
    assert (np.diff(s) > 0).all()
    # eased ends: first step smaller than a middle step
    assert s[1] - s[0] < s[8] - s[7]

    three = np.asarray([[2.0, 0.5, 0.0], [0.0, 0.5, 2.0],
                        [-2.0, 0.5, 0.0]])
    for path in (path_small_circle(three, 12),
                 path_spherical_spiral(three, 12, n_rots=1.5)):
        p = np.asarray(path)
        assert p.shape == (12, 4, 4)
        # orthonormal rotations
        rtr = p[:, :3, :3] @ np.transpose(p[:, :3, :3], (0, 2, 1))
        assert np.allclose(rtr, np.eye(3), atol=1e-4)
        # camera keeps looking at the origin: +z axis ~ -eye direction
        fwd = p[:, :3, 2]
        eye = p[:, :3, 3]
        cos = np.sum(fwd * (-eye), -1) / np.linalg.norm(eye, axis=-1)
        assert (cos > 0.99).all()

    keys = np.asarray(spherical_camera_path(4, radius=2.0))
    out = np.asarray(path_interpolation(keys, 13))
    assert out.shape == (13, 4, 4)
    assert np.allclose(out[0], keys[0], atol=1e-5)
    assert np.allclose(out[-1], keys[-1], atol=1e-5)
    # translations lerp per segment (chords of the orbit): norm in
    # [2·cos(45°), 2] for 4 keys on a radius-2 circle
    norms = np.linalg.norm(out[:, :3, 3], axis=-1)
    assert (norms <= 2.0 + 1e-5).all() and (norms >= 1.40).all()
