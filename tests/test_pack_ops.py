"""pack_ops tests: parity vs per-pack numpy references + grads vs jax.grad.

Mirrors the reference's cross-implementation equivalence strategy
(SURVEY.md §4: pack_ops vs kaolin sum_reduce/diff_cuda), with numpy as the
independent reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nr3d_lib_tpu.graphics import pack_ops as po


def make_packs(rng, n_packs=7, max_count=9, capacity=None, feat_dim=None):
    counts = rng.integers(0, max_count, n_packs)
    counts[0] = 0  # include an empty pack
    total = int(counts.sum())
    capacity = capacity or total + 5
    ridx = np.full(capacity, n_packs, np.int32)
    pos = 0
    for i, c in enumerate(counts):
        ridx[pos:pos + c] = i
        pos += c
    shape = (capacity,) if feat_dim is None else (capacity, feat_dim)
    vals = rng.standard_normal(shape).astype(np.float32)
    vals[pos:] = 0.0
    return jnp.asarray(vals), jnp.asarray(ridx), counts, total


def per_pack(vals, ridx, n_packs):
    vals, ridx = np.asarray(vals), np.asarray(ridx)
    return [vals[ridx == i] for i in range(n_packs)]


def test_pack_infos_roundtrip(rng):
    vals, ridx, counts, total = make_packs(rng)
    n_packs = len(counts)
    np.testing.assert_array_equal(np.asarray(po.counts_from_ridx(ridx, n_packs)), counts)
    infos = po.get_pack_infos_from_n(jnp.asarray(counts))
    np.testing.assert_array_equal(np.asarray(infos[:, 0]), np.cumsum(counts) - counts)
    ridx2 = po.ridx_from_counts(jnp.asarray(counts), ridx.shape[0], n_packs)
    np.testing.assert_array_equal(np.asarray(ridx2), np.asarray(ridx))


def test_interleave(rng):
    counts = jnp.asarray([2, 0, 3])
    vals, ridx = po.interleave_arange_simple(counts, 8)
    np.testing.assert_array_equal(np.asarray(vals[:5]), [0, 1, 0, 1, 2])
    np.testing.assert_array_equal(np.asarray(ridx), [0, 0, 2, 2, 2, 3, 3, 3])

    t, ridx2 = po.interleave_linstep(jnp.asarray([1.0, 5.0, 10.0]), counts,
                                     jnp.asarray([0.5, 1.0, 2.0]), 8)
    np.testing.assert_allclose(np.asarray(t[:5]), [1.0, 1.5, 10.0, 12.0, 14.0])


def test_reductions(rng):
    vals, ridx, counts, _ = make_packs(rng, feat_dim=3)
    n_packs = len(counts)
    groups = per_pack(vals, ridx, n_packs)
    s = np.asarray(po.packed_sum(vals, ridx, n_packs))
    m = np.asarray(po.packed_mean(vals, ridx, n_packs))
    for i, g in enumerate(groups):
        if len(g):
            np.testing.assert_allclose(s[i], g.sum(0), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(m[i], g.mean(0), rtol=1e-5, atol=1e-6)
        else:
            np.testing.assert_allclose(s[i], 0.0)


def test_minmax(rng):
    vals, ridx, counts, _ = make_packs(rng)
    n_packs = len(counts)
    mx = np.asarray(po.packed_max(vals, ridx, n_packs))
    groups = per_pack(vals, ridx, n_packs)
    for i, g in enumerate(groups):
        if len(g):
            np.testing.assert_allclose(mx[i], g.max(), rtol=1e-6)


def test_cumsum_cumprod(rng):
    vals, ridx, counts, _ = make_packs(rng)
    n_packs = len(counts)
    cs = np.asarray(po.packed_cumsum(vals, ridx))
    cse = np.asarray(po.packed_cumsum(vals, ridx, exclusive=True))
    cp = np.asarray(po.packed_cumprod(vals, ridx))
    cpe = np.asarray(po.packed_cumprod(vals, ridx, exclusive=True))
    v, r = np.asarray(vals), np.asarray(ridx)
    for i in range(n_packs):
        g = v[r == i]
        if len(g) == 0:
            continue
        np.testing.assert_allclose(cs[r == i], np.cumsum(g), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(cse[r == i], np.cumsum(g) - g, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(cp[r == i], np.cumprod(g), rtol=1e-4, atol=1e-5)
        excl = np.concatenate([[1.0], np.cumprod(g)[:-1]])
        np.testing.assert_allclose(cpe[r == i], excl, rtol=1e-4, atol=1e-5)


def test_diff(rng):
    vals, ridx, counts, _ = make_packs(rng)
    n_packs = len(counts)
    d = np.asarray(po.packed_diff(vals, ridx, pad_value=-1.0))
    bd = np.asarray(po.packed_backward_diff(vals, ridx, pad_value=-2.0))
    v, r = np.asarray(vals), np.asarray(ridx)
    for i in range(n_packs):
        g = v[r == i]
        if len(g) == 0:
            continue
        np.testing.assert_allclose(d[r == i][:-1], np.diff(g), rtol=1e-5, atol=1e-6)
        assert d[r == i][-1] == -1.0
        np.testing.assert_allclose(bd[r == i][1:], np.diff(g), rtol=1e-5, atol=1e-6)
        assert bd[r == i][0] == -2.0


def test_broadcast_binops(rng):
    vals, ridx, counts, _ = make_packs(rng)
    n_packs = len(counts)
    pv = jnp.asarray(rng.standard_normal(n_packs).astype(np.float32))
    out = np.asarray(po.packed_add(vals, pv, ridx, n_packs))
    v, r = np.asarray(vals), np.asarray(ridx)
    for i in range(n_packs):
        np.testing.assert_allclose(out[r == i], v[r == i] + np.asarray(pv)[i], rtol=1e-6)
    cmp = np.asarray(po.packed_gt(vals, pv, ridx, n_packs))
    for i in range(n_packs):
        np.testing.assert_array_equal(cmp[r == i], v[r == i] > np.asarray(pv)[i])


def test_packed_sort(rng):
    vals, ridx, counts, _ = make_packs(rng)
    n_packs = len(counts)
    payload = vals * 2.0
    s_key, s_ridx, s_payload = po.packed_sort(vals, ridx, payload)
    k, r, p = np.asarray(s_key), np.asarray(s_ridx), np.asarray(s_payload)
    v0, r0 = np.asarray(vals), np.asarray(ridx)
    for i in range(n_packs):
        np.testing.assert_allclose(k[r == i], np.sort(v0[r0 == i]), rtol=1e-6)
        np.testing.assert_allclose(p[r == i], 2.0 * np.sort(v0[r0 == i]), rtol=1e-6)
    # padding stays at end
    assert (r[np.asarray(counts).sum():] == n_packs).all()


def test_searchsorted_and_invert_cdf(rng):
    # two packs of sorted bins with linear cdfs
    bins = jnp.asarray([0.0, 1.0, 2.0, 3.0, 0.0, 2.0, 4.0], jnp.float32)
    cdfs = jnp.asarray([0.0, 0.25, 0.5, 1.0, 0.0, 0.5, 1.0], jnp.float32)
    bins_ridx = jnp.asarray([0, 0, 0, 0, 1, 1, 1], jnp.int32)
    u = jnp.asarray([0.1, 0.6, 0.25, 0.75], jnp.float32)
    u_ridx = jnp.asarray([0, 0, 1, 1], jnp.int32)
    idx = np.asarray(po.packed_searchsorted(cdfs, bins_ridx, u, u_ridx, 2))
    np.testing.assert_array_equal(idx, [1, 3, 5, 6])
    t = np.asarray(po.packed_invert_cdf(bins, cdfs, bins_ridx, u, u_ridx, 2))
    np.testing.assert_allclose(t, [0.4, 2.2, 1.0, 3.0], rtol=1e-5)


def test_alpha_to_vw_and_grad(rng):
    vals, ridx, counts, _ = make_packs(rng)
    n_packs = len(counts)
    alpha = jnp.asarray(np.clip(np.abs(np.asarray(vals)), 0, 0.9))
    vw = np.asarray(po.packed_alpha_to_vw(alpha, ridx))
    a, r = np.asarray(alpha), np.asarray(ridx)
    for i in range(n_packs):
        g = a[r == i]
        t = np.concatenate([[1.0], np.cumprod(1 - g)[:-1]])
        np.testing.assert_allclose(vw[r == i], g * t, rtol=1e-4, atol=1e-6)
    # weights per pack sum to 1 - prod(1-alpha)
    wsum = np.asarray(po.packed_sum(jnp.asarray(vw), ridx, n_packs))
    for i in range(n_packs):
        g = a[r == i]
        if len(g):
            np.testing.assert_allclose(wsum[i], 1 - np.prod(1 - g), rtol=1e-4)

    # gradient check vs finite differences
    def loss(al):
        return (po.packed_alpha_to_vw(al, ridx) * vals).sum()

    g_auto = np.asarray(jax.grad(loss)(alpha))
    eps = 1e-3
    a0 = np.asarray(alpha)
    for j in [0, 1, min(5, len(a0) - 1)]:
        ap, am = a0.copy(), a0.copy()
        ap[j] += eps
        am[j] -= eps
        fd = (loss(jnp.asarray(ap)) - loss(jnp.asarray(am))) / (2 * eps)
        np.testing.assert_allclose(g_auto[j], fd, rtol=2e-2, atol=1e-3)


def test_volume_render_compression():
    alpha = jnp.asarray([0.99, 0.99, 0.5, 0.1, 0.2, 0.0], jnp.float32)
    ridx = jnp.asarray([0, 0, 0, 1, 1, 2], jnp.int32)
    keep, vw = po.packed_volume_render_compression(alpha, ridx, 3, early_stop_eps=1e-3)
    k = np.asarray(keep)
    assert k[0] and k[1] and not k[2]  # transmittance after two 0.99 alphas < 1e-3
    assert k[3] and k[4]


def test_compactify_and_dense_roundtrip(rng):
    vals, ridx, counts, total = make_packs(rng)
    n_packs = len(counts)
    keep = jnp.asarray(np.asarray(vals) > 0) & (ridx < n_packs)
    (out,), new_ridx = po.compactify(keep, [vals], ridx, n_packs)
    v, r, k = np.asarray(vals), np.asarray(ridx), np.asarray(keep)
    kept_vals = v[k]
    np.testing.assert_allclose(np.asarray(out)[:kept_vals.size], kept_vals)
    np.testing.assert_array_equal(np.asarray(new_ridx)[:kept_vals.size], r[k])
    assert (np.asarray(new_ridx)[kept_vals.size:] == n_packs).all()

    dense, mask = po.packed_to_dense(vals, ridx, n_packs, max_per_pack=int(counts.max()) + 1)
    flat2, ridx2 = po.dense_to_packed(dense, mask, capacity=vals.shape[0])
    valid = np.asarray(ridx2) < n_packs
    np.testing.assert_allclose(np.asarray(flat2)[valid], v[r < n_packs], rtol=1e-6)


def test_merge_sorted_aligned():
    tA = jnp.asarray([0.0, 1.0, 2.0, 0.5], jnp.float32)
    rA = jnp.asarray([0, 0, 0, 1], jnp.int32)
    tB = jnp.asarray([0.5, 1.5, 0.0], jnp.float32)
    rB = jnp.asarray([0, 0, 1], jnp.int32)
    vals, key, ridx, is_b = po.merge_two_packs_sorted_aligned(tA, tA, rA, tB, tB, rB, 2)
    np.testing.assert_allclose(np.asarray(key), [0.0, 0.5, 1.0, 1.5, 2.0, 0.0, 0.5])
    np.testing.assert_array_equal(np.asarray(ridx), [0, 0, 0, 0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(is_b), [0, 1, 0, 1, 0, 1, 0])


def test_cumsum_grad(rng):
    vals, ridx, counts, _ = make_packs(rng)

    def loss(v):
        return (po.packed_cumsum(v, ridx) ** 2).sum()

    g = np.asarray(jax.grad(loss)(vals))
    eps, j = 1e-3, 2
    v0 = np.asarray(vals)
    vp, vm = v0.copy(), v0.copy()
    vp[j] += eps
    vm[j] -= eps
    fd = (loss(jnp.asarray(vp)) - loss(jnp.asarray(vm))) / (2 * eps)
    np.testing.assert_allclose(g[j], fd, rtol=2e-2, atol=1e-3)


def test_jit_and_vmap_compat(rng):
    vals, ridx, counts, _ = make_packs(rng)
    n_packs = len(counts)
    f = jax.jit(lambda v: po.packed_sum(v, ridx, n_packs))
    np.testing.assert_allclose(np.asarray(f(vals)),
                               np.asarray(po.packed_sum(vals, ridx, n_packs)), rtol=1e-6)


def test_dense_to_budgeted_oracle(rng):
    """Row-local budget compaction vs a per-row numpy oracle: values of the
    first B True columns, in order; slots past the population come back
    with valid=False (values are unspecified there — callers mask)."""
    r, s, b = 13, 37, 9
    mask = np.asarray(rng.random((r, s)) < 0.3)
    mask[3] = False                      # an empty row
    mask[4] = True                       # a saturated row
    t = rng.standard_normal((r, s)).astype(np.float32) * 100.0
    h = rng.standard_normal((r, s, 5)).astype(np.float32)
    ii = rng.integers(0, 1 << 20, (r, s)).astype(np.int32)

    (t_b, h_b, i_b), valid = po.dense_to_budgeted(
        [jnp.asarray(t), jnp.asarray(h), jnp.asarray(ii)], jnp.asarray(mask), b)
    t_b, h_b, i_b, valid = map(np.asarray, (t_b, h_b, i_b, valid))

    assert t_b.shape == (r, b) and h_b.shape == (r, b, 5) and valid.shape == (r, b)
    assert i_b.dtype == np.int32
    for rr in range(r):
        cols = np.flatnonzero(mask[rr])[:b]
        n = len(cols)
        np.testing.assert_array_equal(valid[rr], np.arange(b) < n)
        # f32 values pass through the one-hot contraction bit-exactly
        np.testing.assert_array_equal(t_b[rr, :n], t[rr, cols])
        np.testing.assert_array_equal(h_b[rr, :n], h[rr, cols])
        np.testing.assert_array_equal(i_b[rr, :n], ii[rr, cols])


def test_budget_indices_matches_budgeted(rng):
    mask = np.asarray(rng.random((7, 24)) < 0.4)
    t = rng.standard_normal((7, 24)).astype(np.float32)
    idx, valid = po.budget_indices(jnp.asarray(mask), 6)
    (t_b,), valid2 = po.dense_to_budgeted([jnp.asarray(t)], jnp.asarray(mask), 6)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid2))
    gathered = np.take_along_axis(t, np.asarray(idx), axis=1)
    v = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(t_b)[v], gathered[v])


def test_dense_to_budgeted_int32_full_range(rng):
    """Integer payloads survive the one-hot contraction EXACTLY across the
    full int32 range (ADVICE r3: a single f32 einsum corrupts |v| >= 2^24;
    the 16-bit-half split is exact). Values pinned at the 2^24 boundary and
    at the int32 extremes."""
    r, s, b = 6, 40, 12
    mask = np.asarray(rng.random((r, s)) < 0.5)
    mask[0] = True
    ii = rng.integers(-2**31, 2**31 - 1, (r, s)).astype(np.int32)
    ii[0, :8] = [2**24 - 1, 2**24, 2**24 + 1, -2**24 - 1,
                 np.iinfo(np.int32).max, np.iinfo(np.int32).min, 0, -1]
    (i_b,), valid = po.dense_to_budgeted([jnp.asarray(ii)], jnp.asarray(mask), b)
    i_b, valid = np.asarray(i_b), np.asarray(valid)
    assert i_b.dtype == np.int32
    for rr in range(r):
        cols = np.flatnonzero(mask[rr])[:b]
        np.testing.assert_array_equal(i_b[rr, :len(cols)], ii[rr, cols])
        assert (i_b[rr, len(cols):] == 0).all()  # invalid slots zero-filled


# ===================================================== round-5 parity tail
def test_interleave_arange_and_linspace(rng):
    import numpy as np
    from nr3d_lib_tpu.graphics import pack_ops as po

    start = jnp.asarray([0.0, 1.0, -2.0])
    stop = jnp.asarray([1.0, 1.5, -2.0])
    step = jnp.asarray([0.3, 0.2, 0.5])
    cap = 16
    v, ridx = po.interleave_arange(start, stop, step, cap)
    # numpy oracle: per-pack arange (reference: counts=ceil((stop-start)/step))
    for i in range(3):
        n_i = int(np.ceil((float(stop[i]) - float(start[i])) / float(step[i])))
        got = np.asarray(v)[np.asarray(ridx) == i]
        np.testing.assert_allclose(
            got, float(start[i]) + np.arange(max(n_i, 0)) * float(step[i]),
            rtol=1e-6)

    v2, ridx2 = po.interleave_linspace(start, stop, 4, cap)
    for i in range(3):
        got = np.asarray(v2)[np.asarray(ridx2) == i]
        np.testing.assert_allclose(
            got, np.linspace(float(start[i]), float(stop[i]), 4),
            rtol=1e-5, atol=1e-7)


def test_interleave_sample_step_wrt_depth_clamped(rng):
    import numpy as np
    from nr3d_lib_tpu.graphics import pack_ops as po

    near = jnp.asarray([0.5, 2.0])
    far = jnp.asarray([3.0, 2.5])
    g, mn, mx = 0.2, 0.05, 0.4
    t, dt, ridx = po.interleave_sample_step_wrt_depth_clamped(
        near, far, max_steps=32, dt_gamma=g, min_step_size=mn,
        max_step_size=mx)
    t, dt, ridx = np.asarray(t), np.asarray(dt), np.asarray(ridx)
    for i in range(2):
        # numpy oracle of the reference recurrence t += clamp(γ·t, mn, mx)
        tt, exp_t, exp_dt = float(near[i]), [], []
        while tt < float(far[i]) and len(exp_t) < 32:
            d = min(max(tt * g, mn), mx)
            exp_t.append(tt)
            exp_dt.append(d)
            tt += d
        got_t = t[ridx == i]
        got_dt = dt[ridx == i]
        np.testing.assert_allclose(got_t, exp_t, rtol=1e-5)
        np.testing.assert_allclose(got_dt, exp_dt, rtol=1e-5)


def test_interleave_sample_step_in_packed_segments(rng):
    import numpy as np
    from nr3d_lib_tpu.graphics import pack_ops as po

    near = jnp.asarray([0.0, 0.0])
    far = jnp.asarray([10.0, 10.0])
    entry = jnp.asarray([1.0, 4.0, 2.0, 1e9])   # last = padded segment
    exit_ = jnp.asarray([2.0, 4.5, 3.0, 1e9])
    seg_ridx = jnp.asarray([0, 0, 1, 2], jnp.int32)  # sentinel ray id = 2
    t, dt, ridx, sidx = po.interleave_sample_step_wrt_depth_in_packed_segments(
        near, far, entry, exit_, seg_ridx, n_rays=2, steps_per_segment=8,
        dt_gamma=0.1, min_step_size=0.2, max_step_size=1.0)
    t, ridx, sidx = np.asarray(t), np.asarray(ridx), np.asarray(sidx)
    # all valid samples lie inside their segment and carry its ray id
    for s in range(3):
        sel = sidx == s
        assert sel.any()
        assert (t[sel] >= float(entry[s]) - 1e-6).all()
        assert (t[sel] < float(exit_[s])).all()
        assert (ridx[sel] == int(seg_ridx[s])).all()
    assert not (sidx == 3).any()  # padded segment produced nothing


def test_merge_two_packs_sorted_nonaligned(rng):
    import numpy as np
    from nr3d_lib_tpu.graphics import pack_ops as po

    # pack set A covers rays {0,1,3}; B covers {1,2} — NOT aligned
    keyA = jnp.asarray([0.1, 0.5, 0.2, 0.9, 0.3])
    ridxA = jnp.asarray([0, 0, 1, 1, 3], jnp.int32)
    keyB = jnp.asarray([0.25, 0.6, 0.15])
    ridxB = jnp.asarray([1, 1, 2], jnp.int32)
    vals, key, ridx, from_b = po.merge_two_packs_sorted(
        keyA, keyA, ridxA, keyB, keyB, ridxB, n_packs=4)
    key, ridx = np.asarray(key), np.asarray(ridx)
    # oracle: per ray, the union of A/B entries, sorted
    for i in range(4):
        exp = np.sort(np.concatenate(
            [np.asarray(keyA)[np.asarray(ridxA) == i],
             np.asarray(keyB)[np.asarray(ridxB) == i]]))
        np.testing.assert_allclose(key[ridx == i], exp)
    # ridx-major ordering (packed contract)
    assert (np.diff(ridx) >= 0).all()


def test_merge_two_batch_a_includes_b(rng):
    import numpy as np
    from nr3d_lib_tpu.graphics import pack_ops as po

    valsA = jnp.asarray([[0.1, 0.4], [0.2, 0.6], [0.3, 0.5]])
    nidxA = jnp.asarray([0, 1, 2], jnp.int32)
    valsB = jnp.asarray([[0.25, 0.05]])
    nidxB = jnp.asarray([1], jnp.int32)
    vals, key, ridx, from_b = po.merge_two_batch_a_includes_b(
        valsA, nidxA, valsB, nidxB, n_packs=3)
    key, ridx = np.asarray(key), np.asarray(ridx)
    np.testing.assert_allclose(key[ridx == 0], [0.1, 0.4])
    np.testing.assert_allclose(key[ridx == 1], [0.05, 0.2, 0.25, 0.6])
    np.testing.assert_allclose(key[ridx == 2], [0.3, 0.5])


def test_expand_boundary_segments_intersect(rng):
    import numpy as np
    from nr3d_lib_tpu.graphics import pack_ops as po

    b = jnp.asarray([True, False, True, False])
    e = po.expand_pack_boundary(b, 3)
    exp = np.zeros(12, bool)
    exp[[0, 6]] = True
    np.testing.assert_array_equal(np.asarray(e), exp)

    pidx = jnp.asarray([7, 7, 3, 3, 3, 5], jnp.int32)
    ridx = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)
    marks = po.octree_mark_consecutive_segments(pidx, ridx)
    np.testing.assert_array_equal(
        np.asarray(marks), [True, False, True, True, False, True])

    a = jnp.asarray([1, 3, 5, 9], jnp.int32)
    bb = jnp.asarray([3, 4, 9], jnp.int32)
    in_b, in_a, union = po.intersect1d_unique(a, bb, n_max=6)
    np.testing.assert_array_equal(np.asarray(in_b),
                                  [False, True, False, True])
    np.testing.assert_array_equal(np.asarray(in_a), [True, False, True])
    np.testing.assert_array_equal(np.asarray(union)[:5], [1, 3, 4, 5, 9])
