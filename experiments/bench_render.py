"""Secondary benchmark: end-to-end NeRF render throughput (rays/s) on TPU.

Not the driver's headline metric (bench.py is) — run manually:
    python experiments/bench_render.py [--brick] [--mode march_occ|march_occ_compressed]

Measures the full march→encode→MLP→composite forward on the real chip with
the chained-timing harness. All arrays are jit ARGUMENTS — closed-over
device arrays become jaxpr constants and the axon compile path degenerates
(memory: tpu-env-pitfalls).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(use_brick: bool = False, mode: str = "march_occ",
         n_rays: int = 8192, compression_factor: float = 0.25,
         w4: bool = False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from flax import nnx

    from nr3d_lib_tpu.models.model_base import LoTDNeRFModel

    enc_cfg = {"lotd_cfg": {
        "lod_res": [16, 32, 64, 128, 256, 512], "lod_n_feats": 2,
        "lod_types": ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash"],
        "hashmap_size": 2 ** 17}}
    if w4:
        # bf16-packed F=4 (ops/lotd_brick4.py): half the levels carry the
        # same 12 output features at half the gather issues per point
        enc_cfg = {"lotd_cfg": {
            "lod_res": [16, 64, 512], "lod_n_feats": 4,
            "lod_types": ["Dense", "Hash", "Hash"],
            "hashmap_size": 2 ** 17}}
    if use_brick:
        enc_cfg["backend"] = "brick"
    qcfg = {"query_mode": mode}
    if mode == "march_occ_compressed":
        qcfg["compression_factor"] = compression_factor
    model = LoTDNeRFModel(
        field_cfg={"encoding_cfg": enc_cfg,
                   "density_decoder_cfg": {"D": 1, "W": 64},
                   "radiance_cfg": {"D": 2, "W": 64}},
        accel_cfg={"resolution": 64, "max_steps_per_ray": 96,
                   "step_size": 2.0 / 96},
        ray_query_cfg=qcfg)
    model.populate()
    # realistic occupancy: ~15% of cells on (a sphere-ish shell), so the
    # compressed path has real sparsity to exploit, as in a trained scene
    occ = jax.random.uniform(jax.random.key(5),
                             model.accel.occ.val_grid[...].shape) < 0.15
    model.accel.occ.val_grid[...] = occ.astype(jnp.float32)
    graphdef, state = nnx.split(model)

    k1, k2 = jax.random.split(jax.random.key(0))
    o = jax.random.normal(k1, (n_rays, 3))
    o = o / jnp.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o / 2.0 + jax.random.normal(k2, (n_rays, 3)) * 0.1
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def render(st, oo, dd):
        m = nnx.merge(graphdef, st)
        rt = m.ray_test(oo, dd)
        rendered, _ = m.ray_query(rt)
        return rendered["rgb_volume"]

    def chain(n):
        def chained(c, st, oo, dd):
            def body(i, carry):
                cc, acc = carry
                y = render(st, oo * (1.0 + cc * 1e-30), dd)
                s = jnp.sum(y.astype(jnp.float32))
                return s * 1e-30, acc + s

            return jax.lax.fori_loop(0, n, body, (c, 0.0))[1]

        return jax.jit(chained)

    f_lo, f_hi = chain(1), chain(5)
    float(f_lo(0.0, state, o, d))
    float(f_hi(0.0, state, o, d))

    def t(f):
        t0 = time.perf_counter()
        float(f(0.0, state, o, d))
        return time.perf_counter() - t0

    dt = (min(t(f_hi) for _ in range(3)) - min(t(f_lo) for _ in range(3))) / 4
    rays_s = n_rays / dt
    samples = n_rays * 96
    print(f"render fwd ({'brick4' if w4 else 'brick' if use_brick else 'xla'}"
          f" encode, {mode}): "
          f"{dt*1e3:.2f} ms / {n_rays} rays -> {rays_s/1e3:.1f} Krays/s "
          f"({samples/dt/1e6:.1f} Msamples/s incl. masked)",
          file=sys.stderr)
    return rays_s


def main_train(use_brick: bool = False, kind: str = "nerf",
               n_rays: int = 4096, n_samples: int = 64):
    """Training-step throughput: full fwd+bwd+adam through the renderer.

    kind='nerf': brick/XLA LoTD NeRF, fixed sampling, frozen-x backward on
    the brick path. kind='neus': LoTD NeuS with nablas + eikonal — the
    2nd-order path (reference math_test.py exercises; StreetSurf workload).
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax
    from flax import nnx

    if kind == "nerf":
        from nr3d_lib_tpu.graphics.nerf_ray_query import nerf_ray_query_fixed
        from nr3d_lib_tpu.models.model_base import LoTDNeRFModel

        enc_cfg = {"lotd_cfg": {
            "lod_res": [16, 32, 64, 128, 256, 512], "lod_n_feats": 2,
            "lod_types": ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash"],
            "hashmap_size": 2 ** 17}}
        if use_brick:
            enc_cfg["backend"] = "brick"
        model = LoTDNeRFModel(field_cfg={
            "encoding_cfg": enc_cfg,
            "density_decoder_cfg": {"D": 1, "W": 64},
            "radiance_cfg": {"D": 2, "W": 64}})
    else:
        from nr3d_lib_tpu.graphics.neus_ray_query import (
            neus_ray_query_coarse_multi_upsample)
        from nr3d_lib_tpu.models.model_base import LoTDNeuSModel

        enc_cfg = {"lotd_cfg": {
            "lod_res": [16, 32, 64, 128], "lod_n_feats": 2,
            "lod_types": ["Dense", "Dense", "Hash", "Hash"],
            "hashmap_size": 2 ** 16}}
        if "w4" in kind:
            # bf16-packed F=4: 2 levels carry the same 8 features
            enc_cfg = {"lotd_cfg": {
                "lod_res": [16, 64], "lod_n_feats": 4,
                "lod_types": ["Dense", "Hash"], "hashmap_size": 2 ** 16}}
        if use_brick or "w4" in kind:
            enc_cfg["backend"] = "brick"
        field_cfg = {"surface_cfg": {
            "encoding_cfg": enc_cfg,
            "decoder_cfg": {"D": 1, "W": 64}},
            "radiance_cfg": {"D": 2, "W": 64}}
        if "compressed" in kind:
            # the production StreetSurf training strategy (reference
            # neus_ray_query.py:732): occ-grid march + upsample, then
            # budget-compact BEFORE the expensive nablas/radiance query —
            # the fwd+bwd+2nd-order path touches compression_factor×S
            # samples instead of S + 3×n_importance.
            model = LoTDNeuSModel(
                field_cfg=field_cfg,
                accel_cfg={"resolution": 64, "max_steps_per_ray": 96,
                           "step_size": 2.0 / 96},
                ray_query_cfg={
                    "query_mode": "march_occ_multi_upsample_compressed",
                    "compression_factor": 0.25,
                    # safe HERE because the bench seeds 15% occupancy below
                    # (per-ray occupied count ≪ 0.5×S); the library default
                    # is 1.0 — budgeting truncates far-first when a ray's
                    # occupancy exceeds the budget
                    "march_budget_factor": 0.5})
        else:
            model = LoTDNeuSModel(field_cfg=field_cfg)
    model.populate()
    if "compressed" in kind:
        import jax.numpy as _jnp

        occ = jax.random.uniform(
            jax.random.key(5), model.accel.occ.val_grid[...].shape) < 0.15
        model.accel.occ.val_grid[...] = occ.astype(_jnp.float32)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    k1, k2 = jax.random.split(jax.random.key(0))
    o = jax.random.normal(k1, (n_rays, 3))
    o = o / jnp.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o / 2.0 + jax.random.normal(k2, (n_rays, 3)) * 0.1
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rgb_gt = jnp.abs(d)

    def step(params, opt_state, oo, dd, key):
        def loss_fn(p):
            m = nnx.merge(graphdef, p, rest)
            rt = m.space.ray_test(oo, dd)
            if kind == "nerf":
                rendered, _ = nerf_ray_query_fixed(
                    m, m.space, rt, n_samples=n_samples, perturb_key=key)
                return jnp.mean((rendered["rgb_volume"] - rgb_gt) ** 2)
            if "compressed" in kind:
                rendered, vb = m.ray_query(rt, key=key)
            else:
                rendered, vb = neus_ray_query_coarse_multi_upsample(
                    m, m.space, rt, n_coarse=n_samples, perturb_key=key)
            loss = jnp.mean((rendered["rgb_volume"] - rgb_gt) ** 2)
            # eikonal on the queried nablas → 2nd-order backward
            if vb.get("nablas") is not None:
                nab, w = vb["nablas"], None
            elif vb.get("nablas_packed") is not None:
                nab = vb["nablas_packed"]
                w = (vb["ridx"] < rt["rays_o"].shape[0]).astype(nab.dtype)
            else:
                nab, w = rendered["normals_volume"], None
            err = (jnp.linalg.norm(nab, axis=-1) - 1.0) ** 2
            eik = (jnp.mean(err) if w is None
                   else jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0))
            return loss + 0.1 * eik

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    def chain(n):
        def chained(c, p, os_, oo, dd):
            def body(i, carry):
                cc, pp, ss = carry
                pp, ss, loss = step(pp, ss, oo * (1.0 + cc * 1e-30), dd,
                                    jax.random.key(0))
                return loss * 1e-30, pp, ss

            out = jax.lax.fori_loop(0, n, body, (c, p, os_))
            return out[0] + jax.tree.leaves(out[1])[0].ravel()[0] * 1e-30

        return jax.jit(chained)

    f_lo, f_hi = chain(1), chain(5)
    float(f_lo(0.0, params, opt_state, o, d))
    float(f_hi(0.0, params, opt_state, o, d))

    def t(f):
        t0 = time.perf_counter()
        float(f(0.0, params, opt_state, o, d))
        return time.perf_counter() - t0

    dt = (min(t(f_hi) for _ in range(3)) - min(t(f_lo) for _ in range(3))) / 4
    print(f"train step ({kind}, {'brick' if use_brick else 'xla'}): "
          f"{dt*1e3:.2f} ms / {n_rays} rays x {n_samples} -> "
          f"{n_rays/dt/1e3:.1f} Krays/s trained, {1.0/dt:.1f} steps/s",
          file=sys.stderr)
    return n_rays / dt


if __name__ == "__main__":
    mode = "march_occ"
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
    if "--compressed" in sys.argv:
        mode = "march_occ_compressed"
    if "--train" in sys.argv:
        kind = "nerf"
        if "--neus_w4" in sys.argv:
            kind = "neus_w4"
        elif "--neus" in sys.argv:
            kind = "neus"
        main_train(use_brick="--brick" in sys.argv, kind=kind)
    else:
        main(use_brick="--brick" in sys.argv, mode=mode,
             w4="--w4" in sys.argv)
