"""Tests: losses, metrics, importance sampling, optim utils, cameras, maths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_recon_losses(rng):
    from nr3d_lib_tpu.models.loss import (get_recon_loss, huber_loss, l1_loss,
                                          mse_loss, relative_l2_loss, smape_loss)

    p = jnp.asarray(rng.standard_normal((16, 3)))
    g = jnp.asarray(rng.standard_normal((16, 3)))
    assert float(mse_loss(p, g)) == pytest.approx(float(jnp.mean((p - g) ** 2)))
    assert float(l1_loss(p, p)) == 0.0
    # huber: quadratic for small, linear for big
    assert float(huber_loss(jnp.asarray([0.01]), jnp.asarray([0.0]), delta=0.1)) \
        == pytest.approx(0.5 * 0.01 ** 2)
    mask = jnp.asarray([1.0] + [0.0] * 15)
    ml = float(mse_loss(p, g, mask=mask))
    assert ml == pytest.approx(float(jnp.mean((p[0] - g[0]) ** 2)), rel=1e-5)
    fn = get_recon_loss("smape")
    assert np.isfinite(float(fn(p, g)))
    assert np.isfinite(float(relative_l2_loss(p, g)))


def test_safe_losses_grad_clamped():
    from nr3d_lib_tpu.models.loss import clipped_mse, safe_binary_cross_entropy

    # BCE near 0/1 would blow up; safe version clamps the grad
    g = jax.grad(lambda p: safe_binary_cross_entropy(p, jnp.asarray(1.0),
                                                     clip_grad=10.0).sum())(
        jnp.asarray(1e-9))
    assert abs(float(g)) <= 10.0
    g2 = jax.grad(lambda p: clipped_mse(p, jnp.asarray(0.0), 1.0).sum())(
        jnp.asarray(100.0))
    assert float(g2) == pytest.approx(2.0)


def test_ssim_and_psnr(rng):
    from nr3d_lib_tpu.graphics.metrics import psnr
    from nr3d_lib_tpu.models.loss import ssim

    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    noisy = jnp.clip(img + 0.2 * jnp.asarray(rng.standard_normal((32, 32, 3)),
                                             jnp.float32), 0, 1)
    assert float(ssim(img, noisy)) < 0.9
    assert float(psnr(img, img)) > 100
    assert 5 < float(psnr(img, noisy)) < 25


def test_regularizers(rng):
    from nr3d_lib_tpu.models.loss import distortion_loss, eikonal_loss

    n = jnp.asarray(rng.standard_normal((32, 3)))
    unit = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    assert float(eikonal_loss(unit)) == pytest.approx(0.0, abs=1e-10)
    assert float(eikonal_loss(2 * unit)) == pytest.approx(1.0, rel=1e-5)
    t = jnp.linspace(0, 1, 16)[None].repeat(4, 0)
    w_spread = jnp.ones((4, 16)) / 16
    w_peak = jnp.zeros((4, 16)).at[:, 8].set(1.0)
    assert float(distortion_loss(t, w_peak)) < float(distortion_loss(t, w_spread))


def test_importance_sampler(rng):
    from nr3d_lib_tpu.models.importance import ErrorMap, ImpSampler

    em = ErrorMap(n_frames=2, res=(16, 16), ema=0.0)
    em.error_map[...] = jnp.full((2, 16, 16), 1e-6)
    # concentrate error in the top-left quadrant of frame 0
    xy = jnp.asarray(rng.uniform(0, 0.25, (500, 2)).astype(np.float32))
    em.collect(0, xy, jnp.full((500,), 10.0))
    sampler = ImpSampler(em, frac_uniform=0.0)
    s = np.asarray(sampler.sample_pixel(jax.random.key(0), 512, 0))
    frac_in_quad = ((s[:, 0] < 0.25) & (s[:, 1] < 0.25)).mean()
    assert frac_in_quad > 0.9, f"importance sampling missed hot region: {frac_in_quad}"


def test_optim_utils():
    import optax

    from nr3d_lib_tpu.models.utils import (batchify_query, calc_grad_norm,
                                           clip_grad_norm, get_optimizer,
                                           get_scheduler)

    sched = get_scheduler("warmup_cosine", lr=1e-2, warmup_steps=10, num_iters=100)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(1e-2, rel=1e-3)
    assert float(sched(100)) < 1e-3
    ms = get_scheduler("multistep", lr=1.0, milestones=[5, 10], gamma=0.1)
    assert float(ms(4)) == pytest.approx(1.0)
    assert float(ms(7)) == pytest.approx(0.1, rel=1e-5)
    assert float(ms(11)) == pytest.approx(0.01, rel=1e-5)

    opt = get_optimizer("adam", lr=1e-3, clip_grad_norm=1.0)
    params = {"w": jnp.ones(3)}
    st = opt.init(params)
    up, _ = opt.update({"w": jnp.ones(3) * 100}, st, params)
    assert np.isfinite(np.asarray(up["w"])).all()

    g = {"a": jnp.ones(4) * 3, "b": jnp.ones(9) * 4}
    assert float(calc_grad_norm(g)) == pytest.approx(np.sqrt(16 * 9 + 9 * 4))
    clipped, norm = clip_grad_norm(g, 1.0)
    assert float(calc_grad_norm(clipped)) == pytest.approx(1.0, rel=1e-5)

    out = batchify_query(lambda x: x * 2, jnp.arange(10.0), chunk=3)
    np.testing.assert_allclose(np.asarray(out), np.arange(10) * 2)


def test_pinhole_roundtrip(rng):
    from nr3d_lib_tpu.graphics.cameras import (pinhole_get_rays, pinhole_lift,
                                               pinhole_project, pixel_grid)

    intr = jnp.asarray([[100.0, 0.0, 32.0], [0.0, 100.0, 24.0], [0, 0, 1.0]])
    uv = jnp.asarray(rng.uniform(0, 64, (32, 2)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 5, (32,)).astype(np.float32))
    x = pinhole_lift(uv, intr, depth)
    uv2, z2 = pinhole_project(x, intr)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(depth), rtol=1e-5)

    grid = pixel_grid(4, 6)
    assert grid.shape == (4, 6, 2)
    c2w = jnp.eye(4)
    o, d = pinhole_get_rays(grid.reshape(-1, 2), intr, c2w)
    assert o.shape == d.shape == (24, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               rtol=1e-5)


def test_distortion_roundtrip(rng):
    from nr3d_lib_tpu.graphics.cameras import opencv_distort, opencv_undistort

    dist = jnp.asarray([0.1, -0.05, 0.001, 0.002])
    xn = jnp.asarray(rng.uniform(-0.5, 0.5, (64, 2)))
    xd = opencv_distort(xn, dist)
    xn2 = opencv_undistort(xd, dist, iters=20)
    np.testing.assert_allclose(np.asarray(xn2), np.asarray(xn), atol=1e-6)


def test_camera_paths_and_lookat():
    from nr3d_lib_tpu.graphics.cameras import (interp_poses, look_at,
                                               spherical_camera_path)

    c2w = look_at([0, 0, 3.0], [0, 0, 0])
    # camera forward (+z col) points toward origin
    np.testing.assert_allclose(np.asarray(c2w[:3, 2]), [0, 0, -1], atol=1e-6)
    path = spherical_camera_path(8, radius=2.0)
    assert path.shape == (8, 4, 4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(path[:, :3, 3]), axis=-1),
                               2.0, rtol=1e-5)
    mid = interp_poses(path[0], path[1], 0.5)
    assert np.isfinite(np.asarray(mid)).all()
    # rotation stays orthonormal
    r = np.asarray(mid[:3, :3])
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_rotation_conversions_roundtrip(rng):
    from nr3d_lib_tpu.maths import (axis_angle_to_matrix, matrix_to_axis_angle,
                                    matrix_to_quaternion, matrix_to_rotation_6d,
                                    quaternion_apply, quaternion_to_matrix,
                                    rotation_6d_to_matrix)

    aa = jnp.asarray(rng.uniform(-1, 1, (16, 3)))
    m = axis_angle_to_matrix(aa)
    # orthonormality
    mm = np.asarray(jnp.einsum("nij,nkj->nik", m, m))
    np.testing.assert_allclose(mm, np.tile(np.eye(3), (16, 1, 1)), atol=1e-6)
    aa2 = matrix_to_axis_angle(m)
    np.testing.assert_allclose(np.asarray(aa2), np.asarray(aa), atol=1e-5)

    q = matrix_to_quaternion(m)
    m2 = quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-6)

    d6 = matrix_to_rotation_6d(m)
    m3 = rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(m3), np.asarray(m), atol=1e-6)

    pts = jnp.asarray(rng.standard_normal((16, 3)))
    np.testing.assert_allclose(np.asarray(quaternion_apply(q, pts)),
                               np.asarray(jnp.einsum("nij,nj->ni", m, pts)),
                               atol=1e-6)


def test_slerp():
    from nr3d_lib_tpu.maths import slerp
    from nr3d_lib_tpu.maths.transforms import axis_angle_to_quaternion

    q0 = axis_angle_to_quaternion(jnp.asarray([0.0, 0.0, 0.0]))
    q1 = axis_angle_to_quaternion(jnp.asarray([0.0, 0.0, np.pi / 2]))
    qm = slerp(q0, q1, 0.5)
    q_expect = axis_angle_to_quaternion(jnp.asarray([0.0, 0.0, np.pi / 4]))
    np.testing.assert_allclose(np.asarray(qm), np.asarray(q_expect), atol=1e-6)


def test_knn_and_chamfer(rng):
    from nr3d_lib_tpu.maths import chamfer_distance, dist_to_nn3_mean, knn_points

    x = jnp.asarray(rng.standard_normal((100, 3)))
    y = x + 1e-3
    d, idx = knn_points(x, y, k=2)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(100))
    cx, cy = chamfer_distance(x, y)
    assert float(cx) < 1e-5 and float(cy) < 1e-5
    # brute-force check on small set
    xs = jnp.asarray(rng.standard_normal((20, 3)))
    ys = jnp.asarray(rng.standard_normal((30, 3)))
    d1, i1 = knn_points(xs, ys, k=1)
    full = np.linalg.norm(np.asarray(xs)[:, None] - np.asarray(ys)[None], axis=-1) ** 2
    np.testing.assert_allclose(np.asarray(d1[:, 0]), full.min(-1), rtol=1e-4)
    nn3 = dist_to_nn3_mean(xs)
    assert nn3.shape == (20,) and (np.asarray(nn3) > 0).all()


def test_logistic_density():
    from nr3d_lib_tpu.maths import logistic_cdf, logistic_density

    # density integrates to ~1
    x = jnp.linspace(-5, 5, 10001)
    dens = logistic_density(x, 3.0)
    integral = float(jnp.trapezoid(dens, x))
    assert integral == pytest.approx(1.0, abs=1e-3)
    # density = d/dx cdf
    g = jax.grad(lambda xx: logistic_cdf(xx, 3.0))(0.37)
    assert float(g) == pytest.approx(float(logistic_density(0.37, 3.0)), rel=1e-6)
