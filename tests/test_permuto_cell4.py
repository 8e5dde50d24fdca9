"""bf16-packed F=4 cell permuto (ops/permuto_cell4.py): XLA-reference
consistency with the classic lattice, interpret-mode kernel parity
(fwd / full bwd / frozen bwd), 3D and 4D (the dynamic-scene case)."""

import jax
import jax.numpy as jnp
import numpy as np

from nr3d_lib_tpu.ops import permuto_cell4 as P4


def test_fwd_kernel_interpret_parity(rng):
    for d, res in [(3, [4.0, 9.0, 17.0]), (4, [3.0, 7.0]),
                   (2, [4.0, 8.0, 16.0]),
                   (3, [float(2 ** (1 + 0.4 * i)) for i in range(10)])]:
        meta = P4.make_permuto_cell4_meta(d, res, hashmap_rows=256)
        table = jnp.asarray(rng.standard_normal((meta.total_rows, 256))
                            .astype(np.float32))
        x = jnp.asarray(rng.uniform(0.0, 1.0, (300, d)).astype(np.float32))
        y_ref = P4.permuto_cell4_encode_xla(x, table, meta)
        assert y_ref.shape == (300, 4 * meta.n_levels)
        saved = P4._FWD_BLOCK
        P4._FWD_BLOCK = 128
        try:
            y_k = P4._encode4_pallas(x, table, meta, tile=256,
                                     interpret=True)
        finally:
            P4._FWD_BLOCK = saved
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"d={d} L={len(res)}")


def test_bwd_kernel_interpret_parity(rng):
    for d, res in [(3, [4.0, 9.0]), (4, [3.0, 6.0])]:
        meta = P4.make_permuto_cell4_meta(d, res, hashmap_rows=128)
        table = jnp.asarray(rng.standard_normal((meta.total_rows, 256))
                            .astype(np.float32))
        n = 512
        x = jnp.asarray(rng.uniform(0.05, 0.95, (n, d)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((n, 4 * meta.n_levels))
                        .astype(np.float32))

        _, vjp = jax.vjp(
            lambda xx, tt: P4.permuto_cell4_encode_xla(xx, tt, meta),
            x, table)
        dx_ref, dtab_ref = vjp(g)
        saved = P4._FWD_BLOCK
        P4._FWD_BLOCK = 256
        try:
            dx_k, dtab_k = P4._bwd4_pallas(x, table, g, meta, tile=512,
                                           interpret=True)
            dx_f, dtab_f = P4._bwd4_pallas(x, table, g, meta, tile=512,
                                           interpret=True, need_dx=False)
        finally:
            P4._FWD_BLOCK = saved
        np.testing.assert_allclose(np.asarray(dtab_k), np.asarray(dtab_ref),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"dtab d={d}")
        np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_ref),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"dx d={d}")
        np.testing.assert_allclose(np.asarray(dtab_f), np.asarray(dtab_ref),
                                   rtol=1e-4, atol=1e-5)
        assert float(jnp.max(jnp.abs(dx_f))) == 0.0


def test_custom_vjp_cpu_and_fit(rng):
    """Public surface on CPU: grads match the XLA reference; a short fit
    through a linear head converges (4D — the dynamic-scene case)."""
    import optax

    meta = P4.make_permuto_cell4_meta(4, [3.0, 6.0, 12.0], hashmap_rows=512)
    table = jnp.asarray(rng.standard_normal((meta.total_rows, 256))
                        .astype(np.float32) * 1e-2)
    x = jnp.asarray(rng.uniform(0.0, 1.0, (2048, 4)).astype(np.float32))

    gt_tab = jax.grad(lambda tt: jnp.sum(
        P4.permuto_cell4_encode(x[:64], tt, meta) ** 2))(table)
    gt_ref = jax.grad(lambda tt: jnp.sum(
        P4.permuto_cell4_encode_xla(x[:64], tt, meta) ** 2))(table)
    np.testing.assert_allclose(np.asarray(gt_tab), np.asarray(gt_ref),
                               rtol=1e-6, atol=1e-7)

    w = jnp.asarray(rng.standard_normal((4 * meta.n_levels, 1))
                    .astype(np.float32)) * 0.3
    tgt = jnp.sin(5 * x[:, :1]) * jnp.cos(3 * x[:, 3:4])

    def loss(tt):
        return jnp.mean((P4.permuto_cell4_encode(x, tt, meta) @ w - tgt) ** 2)

    opt = optax.adam(1e-2)
    ost = opt.init(table)
    tt = table
    l0 = float(loss(tt))

    @jax.jit
    def step(tt, ost):
        l, g = jax.value_and_grad(loss)(tt)
        u, ost = opt.update(g, ost)
        return optax.apply_updates(tt, u), ost, l

    for _ in range(150):
        tt, ost, l = step(tt, ost)
    assert float(l) < 0.5 * l0


def test_nablas4_kernel_and_dynamic_field(rng):
    """F=4 cell nablas kernel parity (interpret) + the dynamic SDF's split
    nablas path vs full autodiff (4D x,t encode; spatial grads only)."""
    meta = P4.make_permuto_cell4_meta(3, [3.0, 7.0], hashmap_rows=128)
    table = jnp.asarray(rng.standard_normal((meta.total_rows, 256))
                        .astype(np.float32))
    n = 512
    x = jnp.asarray(rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((n, 4 * meta.n_levels))
                    .astype(np.float32))
    _, vjp_x = jax.vjp(
        lambda xx: P4.permuto_cell4_encode_xla(xx, table, meta), x)
    nab_ref = vjp_x(g)[0]
    saved = P4._FWD_BLOCK
    P4._FWD_BLOCK = 256
    try:
        nab_k = P4._dydx4_pallas(g, x, table, meta, tile=512,
                                 interpret=True)
    finally:
        P4._FWD_BLOCK = saved
    np.testing.assert_allclose(np.asarray(nab_k), np.asarray(nab_ref),
                               rtol=2e-3, atol=2e-3)

    # dynamic field split path (cell backend routes through bank.nablas)
    from flax import nnx

    from nr3d_lib_tpu.models.fields_dynamic import DynamicPermutoConcatSDF

    f = DynamicPermutoConcatSDF(
        permuto_cfg={"res_list": [3.0, 6.0], "backend": "cell",
                     "n_feats": 4, "hashmap_rows": 128},
        decoder_cfg={"D": 1, "W": 16})
    xs = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    ts = jnp.full((64,), 0.25)
    out = f.forward_sdf_nablas(xs, ts)

    def f_ref(xx):
        o = f._sdf_h(xx, ts, ho=True)
        return o[..., 0], o[..., 1:]

    (sdf_ref, h_ref), vjp_fn = jax.vjp(f_ref, xs)
    nab_ref2 = vjp_fn((jnp.ones_like(sdf_ref), jnp.zeros_like(h_ref)))[0]
    np.testing.assert_allclose(np.asarray(out["sdf"]),
                               np.asarray(sdf_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["nablas"]),
                               np.asarray(nab_ref2), rtol=1e-4, atol=1e-5)

    gdef, state = nnx.split(f)

    def loss(s):
        m = nnx.merge(gdef, s)
        o = m.forward_sdf_nablas(xs, ts)
        return jnp.mean((jnp.linalg.norm(o["nablas"], axis=-1) - 1) ** 2)

    gr = jax.grad(loss)(state)
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(gr))
