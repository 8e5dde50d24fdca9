"""Tests: raytest, AABB spaces, occ-grid state + marching, ray sampling,
NeRF/NeuS volume-render math, MLP blocks, embedders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_ray_box_intersection():
    from nr3d_lib_tpu.graphics.raytest import ray_box_intersection

    o = jnp.asarray([[-5.0, 0.0, 0.0], [-5.0, 3.0, 0.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]] * 3)
    near, far, hit = ray_box_intersection(o, d, -1.0, 1.0)
    np.testing.assert_array_equal(np.asarray(hit), [True, False, True])
    np.testing.assert_allclose(np.asarray(near)[0], 4.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(far)[0], 6.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(far)[2], 1.0, rtol=1e-6)  # inside box


def test_ray_sphere():
    from nr3d_lib_tpu.graphics.raytest import ray_sphere_intersection

    o = jnp.asarray([[-3.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    near, far, hit = ray_sphere_intersection(o, d, radius=1.0)
    assert bool(hit[0])
    np.testing.assert_allclose(np.asarray(near)[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(far)[0], 4.0, rtol=1e-6)


def test_aabb_space_roundtrip():
    from nr3d_lib_tpu.models.spatial import AABBSpace

    sp = AABBSpace(center=[1.0, 2.0, 3.0], radius=[2.0, 2.0, 4.0])
    x = jnp.asarray([[1.0, 2.0, 3.0], [3.0, 4.0, 7.0]])
    xn = sp.normalize_coords(x)
    np.testing.assert_allclose(np.asarray(xn), [[0, 0, 0], [1, 1, 1]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp.unnormalize_coords(xn)), np.asarray(x), atol=1e-6)
    ret = sp.ray_test(jnp.asarray([[-9.0, 2.0, 3.0]]), jnp.asarray([[1.0, 0.0, 0.0]]))
    assert bool(ret["mask"][0])
    np.testing.assert_allclose(float(ret["near"][0]), 8.0, rtol=1e-5)


def test_occgrid_march_and_query(rng):
    from nr3d_lib_tpu.ops.occgrid_march import occgrid_march_dense, occgrid_query

    res = 16
    occ = np.zeros((res, res, res), bool)
    occ[8:12, 6:10, 6:10] = True  # occupied block x∈[0, .5], y,z∈[-.25,.25]
    occ = jnp.asarray(occ)
    o = jnp.asarray([[-2.0, 0.01, 0.01]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    t, dt, mask = occgrid_march_dense(occ, o, d, jnp.asarray([0.0]), jnp.asarray([4.0]),
                                      n_steps=256, step_size=4.0 / 256)
    t_hit = np.asarray(t)[np.asarray(mask)]
    assert len(t_hit) > 0
    x_hit = -2.0 + t_hit  # x coordinate of samples
    assert (x_hit > -0.01).all() and (x_hit < 0.51).all()
    # query directly
    q = occgrid_query(occ, jnp.asarray([[0.25, 0.0, 0.0], [-0.9, -0.9, -0.9]]))
    np.testing.assert_array_equal(np.asarray(q), [True, False])


def test_occgrid_ema_lifecycle(rng):
    from nr3d_lib_tpu.models.accelerations import OccGridEma

    grid = OccGridEma(resolution=8, occ_thre=0.5, ema_decay=0.5)
    # sphere sdf: occupied where |sdf| small... use density: 1 inside r=0.5
    def qfn(x):
        return (jnp.linalg.norm(x, axis=-1) < 0.5).astype(jnp.float32)

    grid.init_from_net(jax.random.key(0), qfn)
    occ0 = np.asarray(grid.occ())
    assert occ0[4, 4, 4] and not occ0[0, 0, 0]
    # EMA decay without re-query support drives unoccupied cells down
    for i in range(5):
        grid.step_update(jax.random.key(i), qfn)
    occ1 = np.asarray(grid.occ())
    assert occ1[4, 4, 4] and not occ1[0, 0, 0]
    # collect_samples marks a new cell
    grid.collect_samples(jnp.asarray([[-0.9, -0.9, -0.9]]), jnp.asarray([5.0]))
    assert bool(np.asarray(grid.occ())[0, 0, 0])
    aabb = np.asarray(grid.try_shrink())
    assert aabb.shape == (2, 3)
    assert (aabb[0] <= -0.7).all()  # includes the collected corner cell


def test_batch_sample_cdf_uniform_weights(rng):
    from nr3d_lib_tpu.graphics.raysample import batch_sample_pdf, batch_sample_step_linear

    near = jnp.zeros(4)
    far = jnp.full((4,), 2.0)
    t, dt = batch_sample_step_linear(near, far, 8)
    assert t.shape == (4, 8) and np.allclose(np.asarray(dt), 0.25)
    # uniform weights → samples roughly uniform
    edges = jnp.linspace(0, 2, 9)
    bins = jnp.broadcast_to(edges, (4, 9))
    w = jnp.ones((4, 8))
    s = batch_sample_pdf(bins, w, 64)
    assert abs(float(s.mean()) - 1.0) < 0.1
    # concentrated weights → samples concentrate
    w2 = jnp.zeros((4, 8)).at[:, 3].set(100.0)
    s2 = batch_sample_pdf(bins, w2, 64)
    frac_in_bin = float(((s2 >= 0.75) & (s2 <= 1.0)).mean())
    assert frac_in_bin > 0.9


def test_neus_sdf_to_alpha():
    from nr3d_lib_tpu.graphics.neus import neus_packed_sdf_to_alpha, neus_ray_sdf_to_alpha

    # sdf crossing zero → alpha spike at crossing
    sdf = jnp.asarray([[0.5, 0.25, 0.05, -0.15, -0.4]])
    alpha = np.asarray(neus_ray_sdf_to_alpha(sdf, 64.0))
    assert alpha.argmax() == 2  # crossing between samples 2 and 3
    assert alpha[0, 2] > 0.9
    # packed equivalence
    ridx = jnp.zeros(5, jnp.int32)
    ap = np.asarray(neus_packed_sdf_to_alpha(sdf[0], 64.0, ridx, append_cdf_1=False))
    np.testing.assert_allclose(ap[:4], alpha[0], rtol=1e-5)
    assert ap[4] == 0.0


def test_mlp_geometric_init_approximates_sphere(rng):
    from nr3d_lib_tpu.models.blocks import MLP

    mlp = MLP(3, 1, D=4, W=256, activation="softplus", geometric_init=True,
              radius_init=0.5, seed=0)
    x = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
    sdf = np.asarray(mlp(x))[:, 0]
    r = np.linalg.norm(np.asarray(x), axis=-1)
    corr = np.corrcoef(sdf, r - 0.5)[0, 1]
    assert corr > 0.8, f"geometric init should approximate sphere sdf, corr={corr}"
    assert abs(float(sdf.mean() - (r - 0.5).mean())) < 0.5


def test_mlp_skips_and_lipshitz(rng):
    from nr3d_lib_tpu.models.blocks import MLP, LipshitzMLP, get_blocks

    mlp = MLP(3, 4, D=4, W=32, skips=(2,), seed=1)
    y = mlp(jnp.ones((5, 3)))
    assert y.shape == (5, 4)
    lip = LipshitzMLP(3, 2, D=2, W=16, seed=2)
    y2 = lip(jnp.ones((5, 3)))
    assert y2.shape == (5, 2) and np.isfinite(np.asarray(y2)).all()
    assert float(lip.lipshitz_bound_full()) > 0
    blk = get_blocks(3, 2, type="mlp", D=1, W=8)
    assert blk(jnp.ones((2, 3))).shape == (2, 2)


def test_sh_encode_orthonormality(rng):
    from nr3d_lib_tpu.models.embedders import sh_encode

    # Monte-Carlo check: SH basis is orthonormal over the sphere
    v = rng.standard_normal((200000, 3))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    basis = np.asarray(sh_encode(jnp.asarray(v), degree=3))  # [N, 9]
    gram = 4 * np.pi * (basis.T @ basis) / v.shape[0]
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_freq_encoder_and_anneal():
    from nr3d_lib_tpu.models.embedders import FreqEncoder, get_embedder

    enc = FreqEncoder(input_dim=3, n_frequencies=4)
    x = jnp.asarray([[0.1, 0.2, 0.3]])
    y = enc(x)
    assert y.shape == (1, enc.out_features) == (1, 3 + 3 * 8)
    np.testing.assert_allclose(np.asarray(y[0, :3]), [0.1, 0.2, 0.3], rtol=1e-6)
    enc_a = FreqEncoder(input_dim=3, n_frequencies=4, annealed=True)
    y0 = np.asarray(enc_a(x, alpha=jnp.asarray(0.0)))
    assert np.allclose(y0[0, 3:], 0.0)  # all bands windowed out
    y_all = np.asarray(enc_a(x, alpha=jnp.asarray(4.0)))
    np.testing.assert_allclose(y_all, np.asarray(y), rtol=1e-6)

    fn, dim = get_embedder({"type": "spherical", "degree": 2})
    assert dim == 4 and fn(jnp.ones((2, 3))).shape == (2, 4)


def test_occgrid_accel_wrapper(rng):
    from nr3d_lib_tpu.models.accelerations import get_accel

    accel = get_accel("occ_grid", resolution=16, occ_thre=0.5,
                      step_size=2.0 / 64, max_steps_per_ray=128)

    def qfn(x):
        return (jnp.linalg.norm(x, axis=-1) < 0.5).astype(jnp.float32)

    accel.init(jax.random.key(0), qfn)
    o = jnp.asarray([[-2.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    t, dt, mask = accel.ray_march(o, d, jnp.asarray([0.0]), jnp.asarray([4.0]))
    x_hit = np.asarray(t)[np.asarray(mask)] - 2.0
    assert len(x_hit) > 0 and (np.abs(x_hit) < 0.6).all()
    stats = accel.debug_stats()
    assert 0 < stats["occ_ratio"] < 0.2


def test_batch_sample_cdf_searchsorted_oracle(rng):
    """The lane-count + one-hot-einsum inverse CDF matches a numpy
    searchsorted(side='right') oracle bin-for-bin."""
    from nr3d_lib_tpu.graphics.raysample import batch_sample_pdf

    r, b, i = 11, 29, 13
    bins = np.sort(rng.random((r, b)).astype(np.float32), axis=-1)
    w = rng.random((r, b - 1)).astype(np.float32)
    w[2] = 0.0                                     # degenerate row
    pdf = (w + 1e-5) / (w + 1e-5).sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((r, 1), np.float32),
                          np.cumsum(pdf, -1)], -1)
    u = np.linspace(0.5 / i, 1 - 0.5 / i, i, dtype=np.float32)
    t = np.asarray(batch_sample_pdf(jnp.asarray(bins), jnp.asarray(w), i))
    for rr in range(r):
        hi = np.clip(np.searchsorted(cdf[rr], u, side="right"), 1, b - 1)
        lo = hi - 1
        c0, c1 = cdf[rr][lo], cdf[rr][hi]
        b0, b1 = bins[rr][lo], bins[rr][hi]
        den = np.where(c1 - c0 < 1e-8, 1.0, c1 - c0)
        frac = np.clip((u - c0) / den, 0, 1)
        np.testing.assert_allclose(t[rr], b0 + frac * (b1 - b0),
                                   rtol=1e-5, atol=1e-6)
