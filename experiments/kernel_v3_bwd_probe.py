"""Compare v2 vs v3 (software-pipelined) brick BACKWARD kernels on the TPU:
numerical equality of (dL/dtable, dL/dx) + chained throughput for both
need_dx variants.

Run: timeout 2400 python experiments/kernel_v3_bwd_probe.py [block ...]
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
    def chained(c, x0, tt, gg):
        def body(i, carry):
            cc, acc = carry
            s = fn(x0 * (1.0 + cc * 1e-30), tt, gg)
            return s * 1e-30, acc + s

        return jax.lax.fori_loop(0, n, body, (c, 0.0))[1]

    return jax.jit(chained)


def _t(f, *a):
    t0 = time.perf_counter()
    float(f(0.0, *a))
    return time.perf_counter() - t0


def measure(fn, x, table, gup, n_pts, n_hi=4):
    lo, hi = chain(fn, 1), chain(fn, n_hi)
    float(lo(0.0, x, table, gup))
    float(hi(0.0, x, table, gup))
    t_lo = min(_t(lo, x, table, gup) for _ in range(2))
    t_hi = min(_t(hi, x, table, gup) for _ in range(2))
    return n_pts / ((t_hi - t_lo) / (n_hi - 1)) / 1e9


def main():
    blocks = [int(a) for a in sys.argv[1:]] or [256]
    meta = B.make_brick_meta(
        [16, 32, 64, 128, 256, 512, 1024, 2048],
        ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash", "Hash", "Hash"],
        hashmap_rows=4096)
    n_pts = 1 << 20
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    table = jax.random.normal(k1, (meta.total_rows, 128), jnp.float32) * 1e-2
    x = jax.random.uniform(k2, (n_pts, 3), jnp.float32)
    gup = jax.random.normal(k3, (n_pts, 2 * meta.n_levels), jnp.float32)

    def bwd_fn(ver, blk, need_dx):
        def f(xx, tt, gg):
            B._FWD_VERSION = ver
            B._FWD_BLOCK = blk
            dx, dtab = B._brick_bwd_pallas(xx, tt, gg, meta,
                                           need_dx=need_dx)
            return jnp.sum(dx.astype(jnp.float32)) + \
                jnp.sum(dtab.astype(jnp.float32))

        return f

    def bwd_raw(ver, blk, need_dx):
        B._FWD_VERSION = ver
        B._FWD_BLOCK = blk
        return jax.jit(lambda xx, tt, gg: B._brick_bwd_pallas(
            xx, tt, gg, meta, need_dx=need_dx))(x, table, gup)

    for need_dx in (True, False):
        tag = "dx" if need_dx else "frozen"
        dx2, dtab2 = bwd_raw(2, 128, need_dx)
        gs2 = measure(bwd_fn(2, 128, need_dx), x, table, gup, n_pts)
        print(f"v2[{tag}]: {gs2:.4f} GS/s ({0.94 / gs2:.1f} cyc/pt)",
              flush=True)
        for blk in blocks:
            dx3, dtab3 = bwd_raw(3, blk, need_dx)
            e_dx = float(jnp.max(jnp.abs(dx3 - dx2)))
            e_dt = float(jnp.max(jnp.abs(dtab3 - dtab2)))
            gs3 = measure(bwd_fn(3, blk, need_dx), x, table, gup, n_pts)
            print(f"v3[{tag},block={blk}]: {gs3:.4f} GS/s "
                  f"({0.94 / gs3:.1f} cyc/pt), err dx={e_dx:.2e} "
                  f"dtab={e_dt:.2e}, speedup {gs3 / gs2:.2f}x", flush=True)


if __name__ == "__main__":
    main()
