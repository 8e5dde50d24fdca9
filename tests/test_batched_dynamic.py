"""Batched-dynamic space + accel (VERDICT round-1 missing item #7;
reference: spatial/batched_dynamic.py, occgrid_accel/batched_dynamic.py:374).
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_batched_dynamic_space_ts_normalization():
    from nr3d_lib_tpu.models.spatial import BatchedDynamicSpace

    sp = BatchedDynamicSpace(n_batch=2,
                             ts_range=jnp.asarray([[0.0, 10.0], [5.0, 7.0]]))
    ts = jnp.asarray([0.0, 5.0, 10.0])
    b0 = sp.normalize_ts(ts, jnp.zeros(3, jnp.int32))
    np.testing.assert_allclose(np.asarray(b0), [-1.0, 0.0, 1.0], atol=1e-6)
    b1 = sp.normalize_ts(jnp.asarray([5.0, 6.0, 7.0]), jnp.ones(3, jnp.int32))
    np.testing.assert_allclose(np.asarray(b1), [-1.0, 0.0, 1.0], atol=1e-5)
    # round trip
    back = sp.unnormalize_ts(b1, jnp.ones(3, jnp.int32))
    np.testing.assert_allclose(np.asarray(back), [5.0, 6.0, 7.0], atol=1e-5)

    rng, norm = BatchedDynamicSpace.normalize_all_ts_keyframes(
        jnp.asarray([[0.0, 2.0, 4.0], [10.0, 11.0, 12.0]]))
    np.testing.assert_allclose(np.asarray(rng), [[0, 4], [10, 12]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(norm[:, 0]), [-1, -1], atol=1e-6)

    x, bidx, ts = sp.sample_pts_uniform(jax.random.key(0), 32)
    assert x.shape == (2, 32, 3) and ts.shape == (2, 32)
    assert float(jnp.abs(x).max()) <= 1.0


def test_batched_dynamic_accel_slots_and_march():
    from nr3d_lib_tpu.models.accelerations import OccGridAccelBatchedDynamic

    acc = OccGridAccelBatchedDynamic(2, 4, resolution=(8, 8, 8),
                                     step_size=2 / 32, max_steps_per_ray=48)
    # slot layout: instance-major
    s = acc.slot(jnp.asarray([0, 1]), jnp.asarray([-1.0, 1.0]))
    np.testing.assert_array_equal(np.asarray(s), [0, 7])

    # occupy instance 0 only at key 0, instance 1 only at key 3
    v = np.zeros((8,) + (8, 8, 8), np.float32)
    v[0] = 1.0
    v[7] = 1.0
    acc.occ.val_grid[...] = jnp.asarray(v)

    o = jnp.asarray([[-2.0, 0.0, 0.0], [-2.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    near = jnp.asarray([1.0, 1.0])
    far = jnp.asarray([3.0, 3.0])
    # instance 0 at its occupied time → samples; at the empty time → none
    ret = acc.ray_march(jnp.asarray([0, 0]), jnp.asarray([-1.0, 1.0]),
                        o, d, near, far)
    assert bool(ret.mask[0].any()) and not bool(ret.mask[1].any())

    # EMA update with a (x, bidx, ts)-conditioned field; bidx/ts arrive
    # broadcast to x's [B·K, n] batch shape
    def query_fn(x, bidx, ts):
        # occupied only for instance 1 after t=0
        return jnp.where((bidx == 1) & (ts > 0),
                         jnp.ones(x.shape[:2]), jnp.zeros(x.shape[:2]))

    acc2 = OccGridAccelBatchedDynamic(2, 4, resolution=(8, 8, 8),
                                      update_every=1)
    acc2.occ.val_grid[...] = jnp.zeros_like(acc2.occ.val_grid[...])
    acc2.step(0, jax.random.key(0), query_fn)
    occ = np.asarray(acc2.occ.occ().reshape(2, 4, -1).any(-1))
    assert not occ[0].any()
    assert occ[1, 2:].all() and not occ[1, :2].any()

    # checkpoint round trip
    sd = acc2.state_dict()
    acc3 = OccGridAccelBatchedDynamic(2, 4, resolution=(8, 8, 8))
    acc3.load_state_dict(sd)
    np.testing.assert_array_equal(np.asarray(acc3.occ.val_grid[...]),
                                  np.asarray(acc2.occ.val_grid[...]))
