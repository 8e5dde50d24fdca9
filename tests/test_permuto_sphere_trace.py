"""Tests: permutohedral encoding math + sphere tracing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nr3d_lib_tpu.ops import permuto as P


def test_simplex_barycentric_partition_of_unity(rng):
    for d in (2, 3, 4, 6):
        x = jnp.asarray(rng.uniform(-5, 5, (64, d)))
        keys, bary = P._simplex(x, d)
        b = np.asarray(bary)
        np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-5)
        assert (b > -1e-5).all(), f"negative barycentric weight d={d}"
        # keys of each vertex differ and are valid lattice coords
        assert keys.shape == (64, d + 1, d)


def test_permuto_encode_continuity(rng):
    meta = P.make_permuto_meta(3, [8.0, 32.0], 2, log2_hashmap_size=12)
    params = jnp.asarray(rng.standard_normal(meta.n_params) * 0.1)
    x0 = jnp.asarray(rng.uniform(0.2, 0.8, (32, 3)))
    eps = 1e-6
    y0 = np.asarray(P.permuto_encode(x0, params, meta))
    y1 = np.asarray(P.permuto_encode(x0 + eps, params, meta))
    # encoding is piecewise-linear and continuous: tiny step → tiny change
    assert np.abs(y1 - y0).max() < 1e-3
    assert y0.shape == (32, 4)


def test_permuto_grads_vs_fd(rng):
    meta = P.make_permuto_meta(3, [4.0, 16.0], 2, log2_hashmap_size=10)
    params = jnp.asarray(rng.standard_normal(meta.n_params) * 0.5)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (8, 3)))
    cot = jnp.asarray(rng.standard_normal((8, meta.out_features)))

    def loss_p(p):
        return (P.permuto_encode(x, p, meta) * cot).sum()

    def loss_x(xx):
        return (P.permuto_encode(xx, params, meta) * cot).sum()

    gp = np.asarray(jax.grad(loss_p)(params))
    eps = 1e-6
    p0 = np.asarray(params)
    nz = np.nonzero(np.abs(gp) > 1e-3)[0]
    for j in nz[:4]:
        pp, pm = p0.copy(), p0.copy()
        pp[j] += eps
        pm[j] -= eps
        fd = (loss_p(jnp.asarray(pp)) - loss_p(jnp.asarray(pm))) / (2 * eps)
        np.testing.assert_allclose(gp[j], fd, rtol=1e-4, atol=1e-7)

    gx = np.asarray(jax.grad(loss_x)(x))
    x0 = np.asarray(x)
    for i, j in [(0, 0), (3, 1), (7, 2)]:
        xp, xm = x0.copy(), x0.copy()
        xp[i, j] += eps
        xm[i, j] -= eps
        fd = (loss_x(jnp.asarray(xp)) - loss_x(jnp.asarray(xm))) / (2 * eps)
        np.testing.assert_allclose(gx[i, j], fd, rtol=1e-3, atol=1e-6)


def test_permuto_fwd_dydx_and_second_order(rng):
    meta = P.make_permuto_meta(3, [4.0, 8.0], 2, log2_hashmap_size=10)
    params = jnp.asarray(rng.standard_normal(meta.n_params) * 0.3)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (6, 3)))
    y, dydx = P.permuto_enc_fwd_dydx(x, params, meta)
    jac = jax.vmap(jax.jacfwd(lambda xx: P.permuto_encode(xx[None], params, meta)[0]))(x)
    np.testing.assert_allclose(np.asarray(dydx), np.asarray(jac), rtol=1e-8, atol=1e-10)

    w = jnp.asarray(rng.standard_normal(meta.out_features))

    def eik(p):
        nab = jax.grad(lambda xx: (P.permuto_encode(xx, p, meta) * w).sum())(x)
        return ((jnp.linalg.norm(nab, axis=-1) - 1.0) ** 2).sum()

    g = np.asarray(jax.grad(eik)(params))
    assert np.isfinite(g).all() and (np.abs(g) > 0).any()


def test_permuto_high_dim_4d(rng):
    """3D+time input (the reference's headline use for permuto)."""
    meta = P.make_permuto_meta(4, [8.0, 24.0], 2, log2_hashmap_size=12)
    params = jnp.asarray(rng.standard_normal(meta.n_params) * 0.1)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (16, 4)))
    y = P.permuto_encode(x, params, meta)
    assert y.shape == (16, 4) and np.isfinite(np.asarray(y)).all()


def test_permuto_encoding_module(rng):
    from nr3d_lib_tpu.models.grid_encodings.permuto import PermutoEncoding

    enc = PermutoEncoding(3, coarsest_res=4, finest_res=64, n_levels=4,
                          n_feats=2, log2_hashmap_size=10, seed=1)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (16, 3)).astype(np.float32))
    y = enc(x)
    assert y.shape == (16, 8)
    y2, dydx = enc.forward_dydx(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6)
    nab = enc.backward_dydx(jnp.ones_like(y), dydx)
    assert nab.shape == (16, 3)


def test_sphere_trace_analytic_sphere():
    from nr3d_lib_tpu.graphics.sphere_trace import RayStatus, sphere_trace

    def sdf(x):
        return jnp.linalg.norm(x, axis=-1) - 0.5

    o = jnp.asarray([[-2.0, 0.0, 0.0], [-2.0, 0.49, 0.0], [-2.0, 0.9, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]] * 3)
    near = jnp.zeros(3)
    far = jnp.full((3,), 4.0)
    out = sphere_trace(o, d, near, far, sdf, max_iters=128)
    hit = np.asarray(out["hit"])
    assert hit[0] and hit[1] and not hit[2]
    np.testing.assert_allclose(float(out["t"][0]), 1.5, atol=2e-3)
    # grazing ray hits near the sphere's edge
    assert abs(float(out["t"][1]) - (2.0 - np.sqrt(0.25 - 0.49 ** 2))) < 0.05
    assert int(out["status"][2]) == RayStatus.OUT


def test_sphere_trace_with_occ_seeding():
    from nr3d_lib_tpu.graphics.sphere_trace import sphere_trace

    def sdf(x):
        return jnp.linalg.norm(x, axis=-1) - 0.5

    res = 32
    centers = (np.stack(np.meshgrid(*([np.arange(res)] * 3), indexing="ij"), -1)
               + 0.5) / res * 2 - 1
    occ = jnp.asarray(np.abs(np.linalg.norm(centers, axis=-1) - 0.5) < 0.2)
    o = jnp.asarray([[-2.0, 0.1, 0.1]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    out = sphere_trace(o, d, jnp.zeros(1), jnp.full((1,), 4.0), sdf,
                       occ_grid=occ, max_iters=64)
    assert bool(out["hit"][0])
    t_expect = 2.0 - np.sqrt(0.25 - 0.02)
    np.testing.assert_allclose(float(out["t"][0]), t_expect, atol=5e-3)


def test_sphere_trace_inside_start():
    """Ray starting inside the surface: signed step moves outward/backward."""
    from nr3d_lib_tpu.graphics.sphere_trace import sphere_trace

    def sdf(x):
        return jnp.linalg.norm(x, axis=-1) - 0.5

    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    out = sphere_trace(o, d, jnp.zeros(1), jnp.full((1,), 4.0), sdf)
    # starting inside: pinned at near with sdf<0 → immediate HIT at near
    assert bool(out["hit"][0]) and float(out["t"][0]) == 0.0
