"""Multi-device tests on the virtual 8-CPU mesh: sharded DP training,
identical results vs single-device, forest block-axis sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx


def test_sharded_train_step_matches_single_device():
    from nr3d_lib_tpu.parallel import make_mesh
    from nr3d_lib_tpu.parallel.train import (make_sharded_train_step,
                                             replicate, shard_rays)

    mesh = make_mesh()
    w0 = {"w": jnp.ones((3, 4)), "b": jnp.zeros(4)}
    opt = optax.sgd(0.1)

    def loss_fn(params, batch, key):
        pred = batch["x"] @ params["w"] + params["b"]
        return jnp.mean((pred - batch["y"]) ** 2)

    batch = {"x": jax.random.normal(jax.random.key(0), (64, 3)),
             "y": jax.random.normal(jax.random.key(1), (64, 4))}

    # single device reference
    st = opt.init(w0)
    loss_ref, g = jax.value_and_grad(loss_fn)(w0, batch, None)
    up, _ = opt.update(g, st, w0)
    w_ref = optax.apply_updates(w0, up)

    step = make_sharded_train_step(loss_fn, opt, mesh, donate=False)
    params = replicate(w0, mesh)
    opt_state = replicate(opt.init(w0), mesh)
    sharded_batch = shard_rays(batch, mesh)
    params2, _, loss2 = step(params, opt_state, sharded_batch, None)
    assert float(loss2) == pytest.approx(float(loss_ref), rel=1e-6)
    np.testing.assert_allclose(np.asarray(params2["w"]), np.asarray(w_ref["w"]),
                               rtol=1e-6)
    # rays were actually sharded over 8 devices
    assert len(sharded_batch["x"].sharding.device_set) == 8


def test_sharded_nerf_render_consistency():
    """Full NeRF ray query sharded over rays == unsharded result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nr3d_lib_tpu.graphics.nerf_ray_query import nerf_ray_query_fixed
    from nr3d_lib_tpu.models.model_base import LoTDNeRFModel
    from nr3d_lib_tpu.parallel import make_mesh

    mesh = make_mesh()
    model = LoTDNeRFModel(
        field_cfg={"encoding_cfg": {"lotd_cfg": {
            "lod_res": [8], "lod_n_feats": 2, "lod_types": "Dense"}},
            "density_decoder_cfg": {"D": 1, "W": 8},
            "radiance_cfg": {"D": 1, "W": 8}})
    graphdef, state = nnx.split(model)

    def render(state, o, d):
        m = nnx.merge(graphdef, state)
        rt = m.space.ray_test(o, d)
        rendered, _ = nerf_ray_query_fixed(m, m.space, rt, n_samples=16)
        return rendered["rgb_volume"]

    o = jax.random.normal(jax.random.key(0), (32, 3)) * 2
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    ref = render(state, o, d)

    f = jax.jit(render, in_shardings=(NamedSharding(mesh, P()),
                                      NamedSharding(mesh, P("data")),
                                      NamedSharding(mesh, P("data"))),
                out_shardings=NamedSharding(mesh, P("data")))
    out = f(jax.device_put(state, NamedSharding(mesh, P())),
            jax.device_put(o, NamedSharding(mesh, P("data"))),
            jax.device_put(d, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_forest_block_axis_sharding():
    """Forest per-block params shard over the 'block' mesh axis; batched
    encode still computes correctly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nr3d_lib_tpu.ops import lotd as L
    from nr3d_lib_tpu.parallel import make_mesh

    mesh = make_mesh([2, 4], ("data", "block"))
    meta = L.generate_meta(3, [6], 2, "Dense")
    n_blocks = 8
    params = jax.random.normal(jax.random.key(0), (n_blocks, meta.n_params))
    x = jax.random.uniform(jax.random.key(1), (64, 3))
    bidx = jax.random.randint(jax.random.key(2), (64,), 0, n_blocks)
    ref = L.lotd_encode(x, params, meta, bidx=bidx)

    # params sharded over block axis, rays over data axis
    p_sh = jax.device_put(params, NamedSharding(mesh, P("block", None)))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    b_sh = jax.device_put(bidx, NamedSharding(mesh, P("data")))
    f = jax.jit(lambda xx, pp, bb: L.lotd_encode(xx, pp, meta, bidx=bb))
    out = f(x_sh, p_sh, b_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
