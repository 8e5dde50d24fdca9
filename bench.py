"""Benchmark: LoTD multi-level hash+dense encode throughput on the real TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): reference CUDA LoTD forward, 8-level Dense+Hash
hash-only fast path, 3.6M points, fp32-in/fp16-params → 1.24 ms ≈
2.9 GSamples/s (nr3d_lib lotd/tests/unit_test.py:131; hardware unstated).
vs_baseline = ours / 2.9.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from nr3d_lib_tpu.ops import lotd as L

    # Mirror the reference bench config: NGP-style levels, Dense small +
    # Hash large, 2 feats/level (unit_test.py config: 9 levels 16→4096).
    res = [16, 32, 64, 128, 256, 512, 1024, 2048]
    types = ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash", "Hash", "Hash"]
    meta = L.generate_meta(3, res, 2, types, hashmap_size=2 ** 19)

    n_pts = 3_600_000
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    params = (jax.random.uniform(k1, (meta.n_params,), jnp.float32, -1e-4, 1e-4)
              .astype(jnp.bfloat16))
    # distinct input buffers per call — identical args can be served from an
    # execution cache on this platform, which fakes a ~10x speedup
    xs = [jax.random.uniform(k, (n_pts, 3), jnp.float32)
          for k in jax.random.split(k2, 8)]

    # Timing on the axon-tunneled TPU: block_until_ready returns early and a
    # host readback costs ~1 s of tunnel latency. So we chain N data-dependent
    # iterations inside ONE jit, read back a single scalar, and difference two
    # run lengths to cancel the constant tunnel latency.
    def chain(n):
        def body(i, carry):
            x, acc = carry
            out = L.lotd_encode(x, params, meta)
            s = jnp.sum(out.astype(jnp.float32))
            # feed the result back into the input: no caching, no elision
            return x + s * 1e-30, acc + s

        return jax.jit(lambda x: jax.lax.fori_loop(0, n, body, (x, 0.0))[1])

    n_lo, n_hi = 1, 6
    run_lo, run_hi = chain(n_lo), chain(n_hi)
    float(run_lo(xs[0]))  # compile (persistent cache amortizes reruns)
    float(run_hi(xs[0]))

    def timed(fn, x):
        t0 = time.perf_counter()
        float(fn(x))
        return time.perf_counter() - t0

    t_lo = min(timed(run_lo, xs[i % len(xs)]) for i in range(2))
    t_hi = min(timed(run_hi, xs[i % len(xs)]) for i in range(2))
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    gsamples = n_pts / dt / 1e9
    baseline = 2.9  # GSamples/s (reference CUDA, 3.6M pts)
    print(json.dumps({
        "metric": "lotd_fwd_throughput_8lvl_dense_hash_3.6Mpts",
        "value": round(gsamples, 4),
        "unit": "GSamples/s",
        "vs_baseline": round(gsamples / baseline, 4),
    }))


if __name__ == "__main__":
    main()
