"""Probe: does the _MAX_CHUNK pallas_call split still cost throughput?

Round-1 found Mosaic crashing on very large per-call shapes (the 2^19-pt
chunk limit) and the driver bench running ~2x below the isolated rate.
The v2 kernel tiles everything through BlockSpecs, so a single call with a
larger grid may now compile. Measures fwd at 3.6M points for several
_MAX_CHUNK values on the real chip (chained timing, args not captures).

Run: python experiments/chunk_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from nr3d_lib_tpu.ops import lotd_brick as B

    meta = B.make_brick_meta(
        [16, 32, 64, 128, 256, 512, 1024, 2048],
        ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash", "Hash", "Hash"],
        hashmap_rows=4096)
    n_pts = 3_600_000
    k1, k2 = jax.random.split(jax.random.key(0))
    table = jax.random.normal(k1, (meta.total_rows, 128), jnp.float32) * 1e-2
    x = jax.random.uniform(k2, (n_pts, 3), jnp.float32)

    def chain(n):
        def chained(c, x0, tt):
            def body(i, carry):
                cc, acc = carry
                y = B.brick_encode(x0 * (1.0 + cc * 1e-30), tt, meta, True,
                                   False)
                s = jnp.sum(y.astype(jnp.float32))
                return s * 1e-30, acc + s

            return jax.lax.fori_loop(0, n, body, (c, 0.0))[1]

        return jax.jit(chained)

    def timed(f, *a):
        t0 = time.perf_counter()
        float(f(0.0, *a))
        return time.perf_counter() - t0

    for shift in (19, 20, 21, 22):
        B._MAX_CHUNK = 1 << shift
        try:
            lo, hi = chain(1), chain(4)
            float(lo(0.0, x, table)); float(hi(0.0, x, table))
            t_lo = min(timed(lo, x, table) for _ in range(2))
            t_hi = min(timed(hi, x, table) for _ in range(2))
            dt = (t_hi - t_lo) / 3
            print(f"_MAX_CHUNK=2^{shift}: {n_pts/dt/1e9:.4f} GS/s "
                  f"({dt*1e3:.1f} ms)", flush=True)
        except Exception as e:
            print(f"_MAX_CHUNK=2^{shift}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            jax.clear_caches()


if __name__ == "__main__":
    main()
