"""LoTD encoding tests.

Strategy mirrors the reference's math_test.py (SURVEY.md §4.1):
  * cross-implementation parity: factorized impls vs an independent
    corner-sum formulation that mirrors the reference CUDA structure
    (fwd_n_linear over grid_val_<type>);
  * gradcheck of 1st AND 2nd order derivatives vs finite differences
    (float64);
  * batched (bidx) semantics incl. bidx=-1 masking; max_level masking.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nr3d_lib_tpu.ops import lotd as L

ALL_3D_TYPES = ["Dense", "VM", "VecZMatXoY", "CP", "CPfast", "NPlaneMul", "NPlaneSum", "Hash"]


# ---------------------------------------------------------------------------
# Independent reference implementation: multilinear interpolation over 2^D
# corner values, with per-type corner value functions (mirrors the reference
# CUDA decomposition, NOT the factorized forms under test).
# ---------------------------------------------------------------------------
def ref_corner_value(table, corner, lod_type, res, size):
    """table: np [size, F]; corner: [D] ints → [F]."""
    d = len(res)
    t = L.LoDType
    if lod_type == t.Dense or (lod_type == t.Hash and int(np.prod(res)) <= size):
        idx = 0
        for k in range(d):
            idx = idx * res[k] + corner[k]
        return table[idx]
    if lod_type == t.Hash:
        h = np.uint32(0)
        for k in range(d):
            h ^= np.uint32(corner[k]) * np.uint32(L.HASH_PRIMES[k])
        return table[int(h % np.uint32(size))]
    if lod_type in (t.CP, t.CPfast):
        out, off = 1.0, 0
        for a in range(d):
            out = out * table[off + corner[a]]
            off += res[a]
        return out
    if lod_type == t.NPlaneSum or lod_type == t.NPlaneMul:
        vals, off = [], 0
        for a in range(d):
            dims = [j for j in range(d) if j != a]
            idx = 0
            for k in dims:
                idx = idx * res[k] + corner[k]
            vals.append(table[off + idx])
            off += int(np.prod([res[j] for j in dims]))
        if lod_type == t.NPlaneSum:
            return np.sum(vals, axis=0)
        out = vals[0]
        for v in vals[1:]:
            out = out * v
        return out
    if lod_type == t.VectorMatrix:
        line_offs, off = [], 0
        for a in range(d):
            line_offs.append(off)
            off += res[a]
        out = 0.0
        for a in range(d):
            dims = [j for j in range(d) if j != a]
            idx = 0
            for k in dims:
                idx = idx * res[k] + corner[k]
            out = out + table[line_offs[a] + corner[a]] * table[off + idx]
            off += int(np.prod([res[j] for j in dims]))
        return out
    if lod_type == t.VecZMatXoY:
        line = table[corner[2]]
        plane = table[res[2] + corner[0] * res[1] + corner[1]]
        return line * plane
    raise ValueError(lod_type)


def ref_encode_level(x, table, lod_type, res, size, interpolation="linear"):
    """Multilinear interp of corner values — independent reference."""
    x = np.asarray(x, np.float64)
    table = np.asarray(table, np.float64)
    n, d = x.shape
    scale = np.asarray([r - 2 for r in res], np.float64)
    v = x * scale + 0.5
    cell = np.floor(v).astype(np.int64)
    frac = v - cell
    if interpolation == "smoothstep":
        tfrac = frac * frac * (3 - 2 * frac)
    else:
        tfrac = frac
    f_dim = table.shape[-1]
    out = np.zeros((n, f_dim))
    for corner in itertools.product(*([range(2)] * d)):
        w = np.ones(n)
        for k, o in enumerate(corner):
            w = w * (tfrac[:, k] if o else 1 - tfrac[:, k])
        for i in range(n):
            cc = cell[i] + np.asarray(corner)
            out[i] += w[i] * ref_corner_value(table, cc, lod_type, res, size)
    return out


def make_level_meta(type_name, res=(6, 5, 7), n_feat=2, hashmap=32):
    return L.generate_meta(3, [list(res)], n_feat, type_name, hashmap_size=hashmap)


@pytest.mark.parametrize("type_name", ALL_3D_TYPES)
@pytest.mark.parametrize("interp", ["linear", "smoothstep"])
def test_level_parity_vs_corner_reference(type_name, interp, rng):
    meta = L.generate_meta(3, [[6, 5, 7]], 2, type_name, hashmap_size=32,
                           use_smooth_step=(interp == "smoothstep"))
    params = jnp.asarray(rng.standard_normal(meta.n_params))
    x = jnp.asarray(rng.uniform(0.01, 0.99, (17, 3)))
    y = np.asarray(L.lotd_encode(x, params, meta))
    table = np.asarray(params).reshape(meta.level_sizes[0], 2)
    y_ref = ref_encode_level(np.asarray(x), table, meta.level_types[0],
                             meta.level_res[0], meta.level_sizes[0], interp)
    np.testing.assert_allclose(y, y_ref, rtol=1e-10, atol=1e-12)


def test_multi_level_mixed_types(rng):
    meta = L.generate_meta(3, [4, [6, 5, 7], 8, 16], [2, 2, 4, 2],
                           ["Dense", "VM", "NPlaneSum", "Hash"], hashmap_size=64)
    assert meta.out_features == 10
    params = jnp.asarray(rng.standard_normal(meta.n_params))
    x = jnp.asarray(rng.uniform(0.05, 0.95, (9, 3)))
    y = L.lotd_encode(x, params, meta)
    assert y.shape == (9, 10)
    # each level block matches its single-level encoding
    for l in range(4):
        sub_meta = L.LoDMeta(3, (meta.level_res[l],), (meta.level_n_feats[l],),
                             (meta.level_types[l],), (meta.hashmap_sizes[l],))
        p_l = params[L.level_param_slice(meta, l)]
        y_l = L.lotd_encode(x, p_l, sub_meta)
        s = meta.out_feat_offsets[l]
        np.testing.assert_allclose(np.asarray(y[:, s:s + meta.level_n_feats[l]]),
                                   np.asarray(y_l), rtol=1e-12)


@pytest.mark.parametrize("type_name", ALL_3D_TYPES)
def test_grad_param_and_x_vs_fd(type_name, rng):
    meta = make_level_meta(type_name)
    params = jnp.asarray(rng.standard_normal(meta.n_params) * 0.5)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (5, 3)))
    cot = jnp.asarray(rng.standard_normal((5, meta.out_features)))

    def loss_p(p):
        return (L.lotd_encode(x, p, meta) * cot).sum()

    def loss_x(xx):
        return (L.lotd_encode(xx, params, meta) * cot).sum()

    gp = np.asarray(jax.grad(loss_p)(params))
    gx = np.asarray(jax.grad(loss_x)(x))
    eps = 1e-6
    # finite differences (float64)
    p0 = np.asarray(params)
    for j in rng.integers(0, meta.n_params, 5):
        pp, pm = p0.copy(), p0.copy()
        pp[j] += eps
        pm[j] -= eps
        fd = (loss_p(jnp.asarray(pp)) - loss_p(jnp.asarray(pm))) / (2 * eps)
        np.testing.assert_allclose(gp[j], fd, rtol=1e-5, atol=1e-7)
    x0 = np.asarray(x)
    for i, j in [(0, 0), (2, 1), (4, 2)]:
        xp, xm = x0.copy(), x0.copy()
        xp[i, j] += eps
        xm[i, j] -= eps
        fd = (loss_x(jnp.asarray(xp)) - loss_x(jnp.asarray(xm))) / (2 * eps)
        np.testing.assert_allclose(gx[i, j], fd, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("type_name", ["Dense", "VM", "CP", "NPlaneMul", "Hash"])
def test_second_order_nablas_grads(type_name, rng):
    """The signature trick (SURVEY.md §3.2): eikonal-style loss on dL/dx must
    backprop into params — reference needs lod_bwd_bwd_input; JAX autodiff."""
    meta = make_level_meta(type_name, n_feat=2)
    params = jnp.asarray(rng.standard_normal(meta.n_params) * 0.5)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (4, 3)))
    w = jnp.asarray(rng.standard_normal(meta.out_features))

    def scalar_field(xx, p):
        return (L.lotd_encode(xx, p, meta) * w).sum(-1)  # [N]

    def eikonal(p):
        nablas = jax.grad(lambda xx: scalar_field(xx, p).sum())(x)  # [N,3]
        return ((jnp.linalg.norm(nablas, axis=-1) - 1.0) ** 2).sum()

    g = np.asarray(jax.grad(eikonal)(params))
    assert np.isfinite(g).all() and (np.abs(g) > 0).any()
    eps = 1e-6
    p0 = np.asarray(params)
    for j in rng.integers(0, meta.n_params, 4):
        pp, pm = p0.copy(), p0.copy()
        pp[j] += eps
        pm[j] -= eps
        fd = (eikonal(jnp.asarray(pp)) - eikonal(jnp.asarray(pm))) / (2 * eps)
        np.testing.assert_allclose(g[j], fd, rtol=1e-4, atol=1e-6)


def test_fwd_dydx_matches_jacobian(rng):
    meta = L.generate_meta(3, [6, 12], 2, ["Dense", "Hash"], hashmap_size=64,
                           use_smooth_step=True)
    params = jnp.asarray(rng.standard_normal(meta.n_params))
    x = jnp.asarray(rng.uniform(0.1, 0.9, (6, 3)))
    y, dydx = L.lotd_fwd_dydx(x, params, meta)
    assert dydx.shape == (6, meta.out_features, 3)
    jac = jax.vmap(jax.jacfwd(lambda xx: L.lotd_encode(xx[None], params, meta)[0]))(x)
    np.testing.assert_allclose(np.asarray(dydx), np.asarray(jac), rtol=1e-10, atol=1e-12)

    dL_dy = jnp.asarray(rng.standard_normal((6, meta.out_features)))
    nablas = L.lotd_bwd_dydx(dL_dy, dydx)
    g = jax.grad(lambda xx: (L.lotd_encode(xx, params, meta) * dL_dy).sum())(x)
    np.testing.assert_allclose(np.asarray(nablas), np.asarray(g), rtol=1e-10, atol=1e-12)


def test_batched_bidx(rng):
    meta = make_level_meta("Dense", res=(5, 5, 5))
    B = 3
    params = jnp.asarray(rng.standard_normal((B, meta.n_params)))
    x = jnp.asarray(rng.uniform(0.1, 0.9, (8, 3)))
    bidx = jnp.asarray([0, 1, 2, 0, 1, 2, -1, 0], jnp.int32)
    y = np.asarray(L.lotd_encode(x, params, meta, bidx=bidx))
    for i in range(8):
        if int(bidx[i]) < 0:
            np.testing.assert_allclose(y[i], 0.0)
        else:
            yi = L.lotd_encode(x[i:i + 1], params[int(bidx[i])], meta)
            np.testing.assert_allclose(y[i], np.asarray(yi)[0], rtol=1e-12)


def test_max_level_and_window(rng):
    meta = L.generate_meta(3, [4, 8, 16], 2, "Dense")
    params = jnp.asarray(rng.standard_normal(meta.n_params))
    x = jnp.asarray(rng.uniform(0.1, 0.9, (4, 3)))
    y = np.asarray(L.lotd_encode(x, params, meta, max_level=0))
    assert (y[:, 2:] == 0).all() and (y[:, :2] != 0).any()
    w = jnp.asarray([1.0, 0.5, 0.0])
    y2 = np.asarray(L.lotd_encode(x, params, meta, level_weights=w))
    y_full = np.asarray(L.lotd_encode(x, params, meta))
    np.testing.assert_allclose(y2[:, 2:4], 0.5 * y_full[:, 2:4], rtol=1e-12)
    np.testing.assert_allclose(y2[:, 4:], 0.0)


def test_jit_with_static_meta(rng):
    meta = make_level_meta("Hash", res=(16, 16, 16), hashmap=128)
    params = jnp.asarray(rng.standard_normal(meta.n_params))
    x = jnp.asarray(rng.uniform(0.1, 0.9, (32, 3)))
    f = jax.jit(lambda xx, pp: L.lotd_encode(xx, pp, meta))
    np.testing.assert_allclose(np.asarray(f(x, params)),
                               np.asarray(L.lotd_encode(x, params, meta)), rtol=1e-12)
