"""Secondary benchmark: end-to-end NeRF render throughput (rays/s) on TPU.

Not the driver's headline metric (bench.py is) — run manually:
    python experiments/bench_render.py [--brick]

Measures the full march→encode→MLP→composite forward on the real chip with
the chained-timing harness (see memory: tpu-env-pitfalls).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(use_brick: bool = False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from flax import nnx

    from nr3d_lib_tpu.graphics.nerf_ray_query import nerf_ray_query_march_occ
    from nr3d_lib_tpu.models.model_base import LoTDNeRFModel

    enc_cfg = {"lotd_cfg": {
        "lod_res": [16, 32, 64, 128, 256, 512], "lod_n_feats": 2,
        "lod_types": ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash"],
        "hashmap_size": 2 ** 17}}
    if use_brick:
        enc_cfg["backend"] = "brick"
    model = LoTDNeRFModel(
        field_cfg={"encoding_cfg": enc_cfg,
                   "density_decoder_cfg": {"D": 1, "W": 64},
                   "radiance_cfg": {"D": 2, "W": 64}},
        accel_cfg={"resolution": 64, "max_steps_per_ray": 96,
                   "step_size": 2.0 / 96})
    model.populate()
    graphdef, state = nnx.split(model)

    n_rays = 8192
    k1, k2 = jax.random.split(jax.random.key(0))
    o = jax.random.normal(k1, (n_rays, 3))
    o = o / jnp.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o / 2.0 + jax.random.normal(k2, (n_rays, 3)) * 0.1
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def render(state, oo, dd):
        m = nnx.merge(graphdef, state)
        rt = m.space.ray_test(oo, dd)
        rendered, _ = nerf_ray_query_march_occ(m, m.accel, m.space, rt)
        return rendered["rgb_volume"]

    run = jax.jit(render)
    out = run(state, o, d)
    float(out.astype(jnp.float32).sum())

    def chain(n):
        def body(i, carry):
            c, acc = carry
            y = run(state, o * (1.0 + c * 1e-30), d)
            s = jnp.sum(y.astype(jnp.float32))
            return s * 1e-30, acc + s

        return jax.jit(lambda c: jax.lax.fori_loop(0, n, body, (c, 0.0))[1])

    f_lo, f_hi = chain(1), chain(5)
    float(f_lo(0.0))
    float(f_hi(0.0))

    def t(f):
        t0 = time.perf_counter()
        float(f(0.0))
        return time.perf_counter() - t0

    dt = (min(t(f_hi) for _ in range(2)) - min(t(f_lo) for _ in range(2))) / 4
    rays_s = n_rays / dt
    samples = n_rays * 96
    print(f"render fwd ({'brick' if use_brick else 'xla'} encode): "
          f"{dt*1e3:.2f} ms / {n_rays} rays -> {rays_s/1e3:.1f} Krays/s "
          f"({samples/dt/1e6:.1f} Msamples/s incl. masked)")


if __name__ == "__main__":
    main(use_brick="--brick" in sys.argv)
