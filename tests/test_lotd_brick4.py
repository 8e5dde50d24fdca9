"""bf16-packed F=4 brick encoding (ops/lotd_brick4.py): packing
round-trip, dense materialization, and interpret-mode kernel parity with
the bf16-quantized XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from nr3d_lib_tpu.ops import lotd as L
from nr3d_lib_tpu.ops import lotd_brick4 as B4


def _meta():
    return B4.make_brick4_meta([16, 32, 64, 128],
                               ["Dense", "Dense", "Hash", "Hash"],
                               hashmap_rows=512)


def test_pack_roundtrip(rng):
    """pack → in-kernel-style unpack (host arithmetic) is exactly the bf16
    quantization of the unpacked table."""
    t = jnp.asarray(rng.standard_normal((32, 256)).astype(np.float32))
    packed = B4.pack_table4(t)
    assert packed.shape == (32, 128)
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    tq = np.asarray(B4._quantize4(t)).reshape(32, 64, 2, 2)
    np.testing.assert_array_equal(np.asarray(lo).reshape(32, 64, 2),
                                  tq[..., 0])
    np.testing.assert_array_equal(np.asarray(hi).reshape(32, 64, 2),
                                  tq[..., 1])


def test_dense_materialization_matches_classic(rng):
    """F=4 dense-from-canonical equals the classic Dense LoTD with 4 feats
    (up to the packed path's bf16 quantization, which this XLA-side check
    does not apply)."""
    res = 16
    classic = L.generate_meta(3, [res], 4, "Dense")
    vparams = jnp.asarray(rng.standard_normal(classic.n_params)
                          .astype(np.float32))
    meta = B4.make_brick4_meta([res], ["Dense"])
    table = B4.materialize_dense_brick4(vparams, meta.levels[0])
    assert table.shape == (meta.levels[0].n_rows, 256)

    x = jnp.asarray(rng.uniform(0.01, 0.99, (128, 3)).astype(np.float32))
    y_classic = L.lotd_encode(x, vparams, classic)
    # reference comparison must quantize the same way the packed path does
    y4 = B4.brick4_encode_xla(x, table, meta)
    y_classic_q = L.lotd_encode(
        x, B4._quantize4(vparams), classic)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y_classic_q),
                               rtol=1e-5, atol=1e-6)
    # and stays close to the unquantized classic (bf16 has ~3 decimal digits)
    assert float(jnp.max(jnp.abs(y4 - y_classic))) < 3e-2


def test_fwd_kernel_interpret_parity(rng):
    meta = _meta()
    table = jnp.asarray(rng.standard_normal((meta.total_rows, 256))
                        .astype(np.float32))
    x = jnp.asarray(rng.uniform(0.0, 0.999, (300, 3)).astype(np.float32))
    y_ref = B4.brick4_encode_xla(x, table, meta)
    y_k = B4._brick4_fwd_pallas(x, table, meta, tile=256, interpret=True)
    assert y_k.shape == (300, 4 * meta.n_levels)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_bwd_kernel_interpret_parity(rng):
    meta = _meta()
    table = jnp.asarray(rng.standard_normal((meta.total_rows, 256))
                        .astype(np.float32))
    n = 512
    # coherent rays AND random points
    o = jnp.asarray(rng.uniform(0.1, 0.3, (8, 1, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((8, 1, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.linspace(0, 0.6, 64, dtype=jnp.float32)[None, :, None]
    x_coh = jnp.clip(o + d * t, 0.0, 0.999).reshape(n, 3)
    x_rnd = jnp.asarray(rng.uniform(0.0, 0.999, (n, 3)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((n, 4 * meta.n_levels))
                    .astype(np.float32))

    for x in (x_coh, x_rnd):
        _, vjp = jax.vjp(
            lambda xx, tt: B4.brick4_encode_xla(xx, tt, meta), x, table)
        dx_ref, dtab_ref = vjp(g)
        dx_k, dtab_k = B4._brick4_bwd_pallas(x, table, g, meta, tile=512,
                                             interpret=True)
        np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_ref),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dtab_k), np.asarray(dtab_ref),
                                   rtol=1e-4, atol=1e-5)

        # frozen-x: dtable only
        dx_f, dtab_f = B4._brick4_bwd_pallas(x, table, g, meta, tile=512,
                                             interpret=True, need_dx=False)
        np.testing.assert_allclose(np.asarray(dtab_f), np.asarray(dtab_ref),
                                   rtol=1e-4, atol=1e-5)
        assert float(jnp.max(jnp.abs(dx_f))) == 0.0


def test_custom_vjp_cpu_path(rng):
    """Public brick4_encode on CPU: grads equal plain autodiff through the
    quantized XLA reference; frozen-x gives zero dx and the same dtable."""
    meta = B4.make_brick4_meta([16, 64], ["Dense", "Hash"], hashmap_rows=256)
    table = jnp.asarray(rng.standard_normal((meta.total_rows, 256))
                        .astype(np.float32))
    x = jnp.asarray(rng.uniform(0.0, 0.999, (64, 3)).astype(np.float32))

    def loss(tt, xx):
        return jnp.sum(B4.brick4_encode(xx, tt, meta) ** 2)

    gt, gx = jax.grad(loss, argnums=(0, 1))(table, x)
    gt_ref, gx_ref = jax.grad(
        lambda tt, xx: jnp.sum(B4.brick4_encode_xla(xx, tt, meta) ** 2),
        argnums=(0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref),
                               rtol=1e-6, atol=1e-7)
    # dx grads reach ~1e2: allow f32 reassociation noise between the
    # custom-vjp recompute and direct autodiff
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-4)

    gt_frozen = jax.grad(
        lambda tt: jnp.sum(B4.brick4_encode_frozen_x(x, tt, meta) ** 2)
    )(table)
    np.testing.assert_allclose(np.asarray(gt_frozen), np.asarray(gt),
                               rtol=1e-6, atol=1e-7)


def test_encoding_module_f4(rng):
    """LoTDBrickEncoding(n_feats=4): shapes, gradients to canonical params
    (dense vertices stay tied), and a quick fit through the public module."""
    import optax
    from flax import nnx

    from nr3d_lib_tpu.models.grid_encodings.lotd.lotd_brick_encoding import (
        LoTDBrickEncoding)

    enc = LoTDBrickEncoding(lod_res=[8, 16, 32], n_feats=4,
                            lod_types=["Dense", "Dense", "Hash"],
                            hashmap_rows=256)
    assert enc.out_features == 12
    x = jnp.asarray(rng.uniform(-0.99, 0.99, (256, 3)).astype(np.float32))
    y = enc(x)
    assert y.shape == (256, 12) and np.isfinite(np.asarray(y)).all()

    gdef, state = nnx.split(enc)
    tgt = jnp.sin(jnp.sum(x * 4.0, -1, keepdims=True))
    w = jnp.asarray(rng.standard_normal((12, 1)).astype(np.float32)) * 0.5

    def loss_s(s):
        m = nnx.merge(gdef, s)
        return jnp.mean((m(x) @ w - tgt) ** 2)

    opt = optax.adam(2e-2)
    ost = opt.init(state)

    @jax.jit
    def step(s, o):
        l, g = jax.value_and_grad(loss_s)(s)
        u, o = opt.update(g, o)
        return jax.tree.map(lambda a, b: a + b, s, u), o, l

    l0 = float(loss_s(state))
    for _ in range(150):
        state, ost, l = step(state, ost)
    assert float(l) < 0.5 * l0


def test_second_order_interpret_parity(rng):
    """F=4 nablas kernel + its 2nd-order backward vs the XLA nested-vjp
    formulation, in interpreter mode."""
    meta = B4.make_brick4_meta([16, 32, 64], ["Dense", "Dense", "Hash"],
                               hashmap_rows=512)
    table = jnp.asarray(rng.standard_normal((meta.total_rows, 256))
                        .astype(np.float32))
    n = 512
    x = jnp.asarray(rng.uniform(0.0, 0.999, (n, 3)).astype(np.float32))
    g_up = jnp.asarray(rng.standard_normal((n, 4 * meta.n_levels))
                       .astype(np.float32))
    gg = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    # primal: nablas kernel vs XLA vjp
    _, vjp_x = jax.vjp(lambda xx: B4.brick4_encode_xla(xx, table, meta), x)
    nab_ref = vjp_x(g_up)[0]
    nab_k = B4._brick4_dydx_pallas(g_up, x, table, meta, tile=512,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(nab_k), np.asarray(nab_ref),
                               rtol=2e-4, atol=2e-3)

    # backward: the three cotangents vs XLA double-vjp
    def nab_fn(gu, xx, tt):
        _, vjp_fn = jax.vjp(
            lambda x_: B4.brick4_encode_xla(x_, tt, meta), xx)
        return vjp_fn(gu)[0]

    _, vjp2 = jax.vjp(nab_fn, g_up, x, table)
    dgup_ref, dx_ref, dtab_ref = vjp2(gg)
    dgup_k, dx_k, dtab_k = B4._brick4_bwd2_pallas(g_up, x, table, gg, meta,
                                                  tile=512, interpret=True)
    np.testing.assert_allclose(np.asarray(dgup_k), np.asarray(dgup_ref),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dtab_k), np.asarray(dtab_ref),
                               rtol=2e-4, atol=2e-3)


def test_nablas4_custom_vjp_cpu(rng):
    """brick4_nablas on CPU: eikonal-style loss grads to (g_up, x, table)
    equal plain nested autodiff through brick4_encode_xla."""
    meta = B4.make_brick4_meta([16], ["Dense"])
    table = jnp.asarray(rng.standard_normal((meta.total_rows, 256))
                        .astype(np.float32))
    x = jnp.asarray(rng.uniform(0.0, 0.999, (64, 3)).astype(np.float32))
    g_up = jnp.asarray(rng.standard_normal((64, 4)).astype(np.float32))

    def eik(gu, xx, tt):
        nab = B4.brick4_nablas(gu, xx, tt, meta)
        return jnp.mean((jnp.linalg.norm(nab, axis=-1) - 1.0) ** 2)

    def eik_ref(gu, xx, tt):
        _, vjp_fn = jax.vjp(
            lambda x_: B4.brick4_encode_xla(x_, tt, meta), xx)
        nab = vjp_fn(gu)[0]
        return jnp.mean((jnp.linalg.norm(nab, axis=-1) - 1.0) ** 2)

    g1 = jax.grad(eik, argnums=(0, 1, 2))(g_up, x, table)
    g2 = jax.grad(eik_ref, argnums=(0, 1, 2))(g_up, x, table)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_bwd_v4_kernel_interpret_parity(rng):
    """Round-5 v4 F=4 backward (per-(level,half) accumulators + packed-g
    residual) vs the XLA vjp; covers want_g forward, need_dx, frozen."""
    import nr3d_lib_tpu.ops.lotd_brick as B

    meta = _meta()
    table = jnp.asarray(rng.standard_normal((meta.total_rows, 256))
                        .astype(np.float32))
    n = 512
    x = jnp.asarray(rng.uniform(0.0, 0.999, (n, 3)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((n, 4 * meta.n_levels))
                    .astype(np.float32))
    saved = B._FWD_BLOCK
    B._FWD_BLOCK = 256
    try:
        import nr3d_lib_tpu.ops.lotd_brick4 as B4mod
        saved4 = B4mod._FWD_BLOCK
        B4mod._FWD_BLOCK = 128
        assert B4._v4_ok4(meta, tile=512)
        y, gpk = B4._brick4_fwd_pallas_g(x, table, meta, tile=512,
                                         interpret=True)
        y_ref = B4.brick4_encode_xla(x, table, meta)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)
        _, vjp = jax.vjp(
            lambda xx, tt: B4.brick4_encode_xla(xx, tt, meta), x, table)
        dx_ref, dtab_ref = vjp(g)
        dx4, dtab4 = B4._brick4_bwd_pallas_v4(x, gpk, g, meta,
                                              table.shape[0], tile=512,
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(dx4), np.asarray(dx_ref),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dtab4), np.asarray(dtab_ref),
                                   rtol=1e-4, atol=1e-5)
        dxf, dtabf = B4._brick4_bwd_pallas_v4(x, None, g, meta,
                                              table.shape[0], tile=512,
                                              interpret=True, need_dx=False)
        np.testing.assert_allclose(np.asarray(dtabf), np.asarray(dtab_ref),
                                   rtol=1e-4, atol=1e-5)
        assert float(jnp.max(jnp.abs(dxf))) == 0.0
        B4mod._FWD_BLOCK = saved4
    finally:
        B._FWD_BLOCK = saved
