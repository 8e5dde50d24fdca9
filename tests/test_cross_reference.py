"""Cross-implementation equivalence vs INDEPENDENT references.

The reference library's second test category (SURVEY §4: pack_ops vs
kaolin, permuto vs the original repo, octree vs kaolin) checks kernels
against implementations nobody here wrote. The TPU equivalents below use
scipy and torch-cpu as the independent oracles:

  rotations / slerp        vs scipy.spatial.transform.Rotation / Slerp
  knn (dists + indices)    vs torch.cdist().topk
  trilinear / gridsample1d vs torch.nn.functional.grid_sample
  logistic cdf/pdf (NeuS)  vs scipy.stats.logistic
  spherical harmonics      vs scipy.special.sph_harm_y (up to the NGP
                           sign convention — |values| compared)
"""

import jax.numpy as jnp
import numpy as np
import pytest

rng = np.random.default_rng(7)


def test_rotations_vs_scipy():
    from scipy.spatial.transform import Rotation

    from nr3d_lib_tpu.maths import transforms as T

    q = rng.standard_normal((64, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    m_ours = np.asarray(T.quaternion_to_matrix(jnp.asarray(q, jnp.float32)))
    m_sp = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()  # wxyz→xyzw
    np.testing.assert_allclose(m_ours, m_sp, atol=2e-6)

    aa = rng.standard_normal((64, 3)) * 2.0
    m1 = np.asarray(T.axis_angle_to_matrix(jnp.asarray(aa, jnp.float32)))
    np.testing.assert_allclose(m1, Rotation.from_rotvec(aa).as_matrix(),
                               atol=2e-6)

    q_back = np.asarray(T.matrix_to_quaternion(jnp.asarray(m_sp, jnp.float32)))
    dot = np.abs(np.sum(q_back * q, -1))       # sign-free quaternion equality
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_slerp_vs_scipy():
    from scipy.spatial.transform import Rotation, Slerp

    from nr3d_lib_tpu.maths.slerp import slerp

    q = rng.standard_normal((2, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    sl = Slerp([0, 1], Rotation.from_quat(q[:, [1, 2, 3, 0]]))
    for t in (0.1, 0.5, 0.9):
        ours = np.asarray(slerp(jnp.asarray(q[0], jnp.float32),
                                jnp.asarray(q[1], jnp.float32), t))
        sp = sl([t]).as_quat()[0][[3, 0, 1, 2]]
        assert abs(abs(np.dot(ours, sp)) - 1) < 1e-5


def test_knn_vs_torch():
    import torch

    from nr3d_lib_tpu.maths.knn import knn_points

    x = rng.standard_normal((256, 3)).astype(np.float32)
    y = rng.standard_normal((300, 3)).astype(np.float32)
    d_ours, i_ours = knn_points(jnp.asarray(x), jnp.asarray(y), k=3)
    # Primary oracle: float64 brute force. torch.cdist is NOT a tight oracle
    # here — for these sizes it takes the ‖x‖²−2x·y+‖y‖² mm path, whose
    # backend kernel (oneDNN) has env-dependent precision: observed up to
    # 4.3e-4 off f64 under CPU load, while ours (exact coordinate-difference
    # refinement) stays within 4e-7. So assert tightly vs f64 and keep torch
    # as a loose independent cross-check.
    d64 = ((x[:, None, :].astype(np.float64)
            - y[None, :, :].astype(np.float64)) ** 2).sum(-1)
    i64 = np.argsort(d64, axis=1)[:, :3]
    np.testing.assert_allclose(np.asarray(d_ours),
                               np.take_along_axis(d64, i64, 1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_ours), i64)
    d_t, i_t = (torch.cdist(torch.from_numpy(x), torch.from_numpy(y)) ** 2
                ).topk(3, largest=False)
    np.testing.assert_allclose(np.asarray(d_ours), d_t.numpy(), atol=2e-3)


def test_grid_interp_vs_torch_grid_sample():
    import torch
    import torch.nn.functional as F

    from nr3d_lib_tpu.models.grid_encodings.utils import (gridsample1d,
                                                          trilinear_interp)

    g = rng.standard_normal((5, 6, 7, 2)).astype(np.float32)
    pts = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    ours = np.asarray(trilinear_interp(jnp.asarray(g), jnp.asarray(pts)))
    # torch grid coords are (x→W, y→H, z→D); our grid axes are (x, y, z)
    inp = torch.from_numpy(g).permute(3, 0, 1, 2)[None]
    tg = torch.from_numpy(pts[:, [2, 1, 0]])[None, None, None]
    ref = F.grid_sample(inp, tg, mode="bilinear",
                        align_corners=True)[0, :, 0, 0].T.numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    line = rng.standard_normal((9, 4)).astype(np.float32)
    t = rng.uniform(-1, 1, (33,)).astype(np.float32)
    o1 = np.asarray(gridsample1d(jnp.asarray(line), jnp.asarray(t)))
    inp = torch.from_numpy(line).T[None, :, None]
    tg = torch.stack([torch.from_numpy(t), torch.zeros(33)], -1)[None, None]
    o2 = F.grid_sample(inp, tg, mode="bilinear",
                       align_corners=True)[0, :, 0].T.numpy()
    np.testing.assert_allclose(o1, o2, atol=1e-6)


def test_logistic_vs_scipy():
    from scipy.stats import logistic as sp_logistic

    from nr3d_lib_tpu.maths.common import logistic_cdf, logistic_density

    xs = rng.standard_normal(200).astype(np.float32)
    for inv_s in (1.0, 7.0, 64.0):
        np.testing.assert_allclose(
            np.asarray(logistic_cdf(jnp.asarray(xs), inv_s)),
            sp_logistic.cdf(xs, scale=1 / inv_s), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(logistic_density(jnp.asarray(xs), inv_s)),
            sp_logistic.pdf(xs, scale=1 / inv_s), atol=1e-4, rtol=1e-5)


def test_sh_encode_vs_scipy():
    try:
        from scipy.special import sph_harm_y
    except ImportError:                                  # older scipy
        pytest.skip("scipy.special.sph_harm_y unavailable")

    from nr3d_lib_tpu.models.embedders import sh_encode

    dirs = rng.standard_normal((64, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ours = np.asarray(sh_encode(jnp.asarray(dirs, jnp.float32), degree=4))
    theta = np.arccos(np.clip(dirs[:, 2], -1, 1))
    phi = np.arctan2(dirs[:, 1], dirs[:, 0])

    def real_sh(l, m):
        if m == 0:
            return np.real(sph_harm_y(l, 0, theta, phi))
        if m > 0:
            return np.sqrt(2) * (-1) ** m * np.real(sph_harm_y(l, m, theta,
                                                               phi))
        return np.sqrt(2) * (-1) ** m * np.imag(sph_harm_y(l, -m, theta, phi))

    ref = np.stack([real_sh(l, m) for l in range(4)
                    for m in range(-l, l + 1)], -1)
    # NGP's component signs differ from the Condon–Shortley real basis;
    # magnitudes must agree exactly
    np.testing.assert_allclose(np.abs(ours), np.abs(ref), atol=1e-5)


def test_camera_distortion_vs_opencv():
    """opencv_distort / fisheye_distort vs cv2 itself (projectPoints /
    fisheye.distortPoints with K = I), plus undistort round trips."""
    cv2 = pytest.importorskip("cv2")

    from nr3d_lib_tpu.graphics.cameras import (fisheye_distort,
                                               fisheye_undistort,
                                               opencv_distort,
                                               opencv_undistort)

    xn = rng.uniform(-0.4, 0.4, (64, 2)).astype(np.float64)
    dist = np.asarray([0.1, -0.05, 0.01, -0.005, 0.02])   # k1,k2,p1,p2,k3
    ours = np.asarray(opencv_distort(jnp.asarray(xn), jnp.asarray(dist)))
    obj = np.concatenate([xn, np.ones((64, 1))], -1)
    ref, _ = cv2.projectPoints(obj, np.zeros(3), np.zeros(3), np.eye(3),
                               dist)
    np.testing.assert_allclose(ours, ref[:, 0, :], atol=1e-6)
    back = np.asarray(opencv_undistort(jnp.asarray(ours), jnp.asarray(dist)))
    np.testing.assert_allclose(back, xn, atol=1e-6)

    distf = np.asarray([0.05, -0.01, 0.003, -0.001])
    oursf = np.asarray(fisheye_distort(jnp.asarray(xn), jnp.asarray(distf)))
    reff = cv2.fisheye.distortPoints(xn[None], np.eye(3), distf)
    np.testing.assert_allclose(oursf, reff[0], atol=1e-6)
    backf = np.asarray(fisheye_undistort(jnp.asarray(oursf),
                                         jnp.asarray(distf)))
    np.testing.assert_allclose(backf, xn, atol=1e-6)


def test_pack_ops_vs_torch_segment_reduce():
    """packed_sum / packed_cumsum / packed_cumprod vs torch oracles
    (index_add, and per-pack loops over torch.cumsum/cumprod)."""
    import torch

    from nr3d_lib_tpu.graphics.pack_ops import (packed_cumprod,
                                                packed_cumsum, packed_sum)

    n_packs = 17
    counts = rng.integers(0, 9, n_packs)
    ridx = np.repeat(np.arange(n_packs), counts).astype(np.int32)
    feats = rng.standard_normal((len(ridx), 3)).astype(np.float32)

    ours = np.asarray(packed_sum(jnp.asarray(feats), jnp.asarray(ridx),
                                 n_packs))
    ref = torch.zeros(n_packs, 3).index_add(
        0, torch.from_numpy(ridx.astype(np.int64)),
        torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    pos = (np.abs(feats[:, 0]) + 0.1).astype(np.float32)
    cs = np.asarray(packed_cumsum(jnp.asarray(pos), jnp.asarray(ridx)))
    cp = np.asarray(packed_cumprod(jnp.asarray(pos), jnp.asarray(ridx)))
    t = torch.from_numpy(pos)
    start = 0
    for c in counts:
        seg = slice(start, start + c)
        np.testing.assert_allclose(cs[seg], torch.cumsum(t[seg], 0).numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(cp[seg], torch.cumprod(t[seg], 0).numpy(),
                                   rtol=1e-5, atol=1e-6)
        start += c
