"""Compare the v2 (phase-serial) and v3 (software-pipelined) brick forward
kernels on the real TPU: numerical equality + chained-timing throughput.

Run: timeout 1800 python experiments/kernel_v3_probe.py [block ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nr3d_lib_tpu.ops import lotd_brick as B


def chain(fn, n):
    def chained(c, x0, tt):
        def body(i, carry):
            cc, acc = carry
            y = fn(x0 * (1.0 + cc * 1e-30), tt)
            s = jnp.sum(y.astype(jnp.float32))
            return s * 1e-30, acc + s

        return jax.lax.fori_loop(0, n, body, (c, 0.0))[1]

    return jax.jit(chained)


def _t(f, *a):
    t0 = time.perf_counter()
    float(f(0.0, *a))
    return time.perf_counter() - t0


def measure(fn, x, table, n_pts, n_hi=8):
    lo, hi = chain(fn, 1), chain(fn, n_hi)
    float(lo(0.0, x, table))
    float(hi(0.0, x, table))
    t_lo = min(_t(lo, x, table) for _ in range(2))
    t_hi = min(_t(hi, x, table) for _ in range(2))
    return n_pts / ((t_hi - t_lo) / (n_hi - 1)) / 1e9


def main():
    blocks = [int(a) for a in sys.argv[1:]] or [128]
    meta = B.make_brick_meta(
        [16, 32, 64, 128, 256, 512, 1024, 2048],
        ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash", "Hash", "Hash"],
        hashmap_rows=4096)
    n_pts = 3_600_000
    k1, k2 = jax.random.split(jax.random.key(0))
    table = jax.random.normal(k1, (meta.total_rows, 128), jnp.float32) * 1e-2
    x = jax.random.uniform(k2, (n_pts, 3), jnp.float32)

    def run_v(ver, blk):
        def f(xx, tt):
            B._FWD_VERSION = ver
            B._FWD_BLOCK = blk
            return B._brick_encode_pallas(xx, tt, meta)

        return f

    B._FWD_VERSION = 2
    y2 = jax.jit(lambda xx, tt: B._brick_encode_pallas(xx, tt, meta))(
        x, table)
    for rep in range(3):
        gs2 = measure(run_v(2, 128), x, table, n_pts)
        print(f"v2[rep{rep}]: {gs2:.4f} GS/s ({0.94 / gs2:.1f} cyc/pt)",
              flush=True)

    for blk in blocks:
        B._FWD_VERSION = 3
        B._FWD_BLOCK = blk
        y3 = jax.jit(lambda xx, tt: B._brick_encode_pallas(xx, tt, meta))(
            x, table)
        err = float(jnp.max(jnp.abs(y3 - y2)))
        for rep in range(3):
            gs3 = measure(run_v(3, blk), x, table, n_pts)
            print(f"v3[block={blk},rep{rep}]: {gs3:.4f} GS/s "
                  f"({0.94 / gs3:.1f} cyc/pt), max|v3-v2|={err:.2e}, "
                  f"speedup {gs3 / gs2:.2f}x", flush=True)


if __name__ == "__main__":
    main()
