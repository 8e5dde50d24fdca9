"""v4 backward probe: per-level dtab accumulators + gather-free (saved g)
vs the v3 pipelined RMW backward, on the real TPU.

Measures (8-level bench config, 1M pts):
  * v3 bwd (need_dx True/False)            — round-4 shipped path
  * v4 bwd (need_dx True/False)            — round-5 candidate
  * fwd_g (forward + g store) vs plain fwd — the residual-store overhead
  * end-to-end fwdbwd via the custom VJP   — the bench.py metric

Run: timeout 2400 python experiments/bwd_v4_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nr3d_lib_tpu.ops import lotd_brick as B


def chain(fn, n):
    def chained(c, *args):
        def body(i, carry):
            cc, acc = carry
            s = fn(args[0] * (1.0 + cc * 1e-30), *args[1:])
            return s * 1e-30, acc + s

        return jax.lax.fori_loop(0, n, body, (c, 0.0))[1]

    return jax.jit(chained)


def _t(f, *a):
    t0 = time.perf_counter()
    float(f(0.0, *a))
    return time.perf_counter() - t0


def measure(fn, args, n_pts, n_hi=4):
    lo, hi = chain(fn, 1), chain(fn, n_hi)
    float(lo(0.0, *args))
    float(hi(0.0, *args))
    t_lo = min(_t(lo, *args) for _ in range(2))
    t_hi = min(_t(hi, *args) for _ in range(2))
    return n_pts / ((t_hi - t_lo) / (n_hi - 1)) / 1e9


def main():
    meta = B.make_brick_meta(
        [16, 32, 64, 128, 256, 512, 1024, 2048],
        ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash", "Hash", "Hash"],
        hashmap_rows=4096)
    n_pts = 1 << 20
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    table = jax.random.normal(k1, (meta.total_rows, 128), jnp.float32) * 1e-2
    x = jax.random.uniform(k2, (n_pts, 3), jnp.float32)
    gup = jax.random.normal(k3, (n_pts, 2 * meta.n_levels), jnp.float32)
    print(f"v4_ok: {B._v4_ok(meta)}", flush=True)

    # ---- correctness: v4 vs v3 on hardware
    dx3, dtab3 = jax.jit(lambda xx, tt, gg: B._brick_bwd_pallas(
        xx, tt, gg, meta, need_dx=True))(x, table, gup)
    _, gpk = jax.jit(lambda xx, tt: B._brick_encode_pallas_g(
        xx, tt, meta))(x, table)
    dx4, dtab4 = jax.jit(lambda xx, gg, gp: B._brick_bwd_pallas_v4(
        xx, gp, gg, meta, jnp.float32))(x, gup, gpk)
    print(f"err dx={float(jnp.max(jnp.abs(dx4 - dx3))):.2e} "
          f"dtab={float(jnp.max(jnp.abs(dtab4 - dtab3))):.2e}", flush=True)

    # ---- throughput: raw bwd kernels
    def v3_bwd(need_dx):
        def f(xx, tt, gg):
            dx, dt = B._brick_bwd_pallas(xx, tt, gg, meta, need_dx=need_dx)
            return jnp.sum(dx) + jnp.sum(dt)

        return f

    def v4_bwd(need_dx):
        if need_dx:
            def f(xx, gg, gp):
                dx, dt = B._brick_bwd_pallas_v4(xx, gp, gg, meta,
                                                jnp.float32)
                return jnp.sum(dx) + jnp.sum(dt)
        else:
            def f(xx, gg, gp):
                dx, dt = B._brick_bwd_pallas_v4(xx, None, gg, meta,
                                                jnp.float32, need_dx=False)
                return jnp.sum(dx) + jnp.sum(dt)

        return f

    for need_dx in (True, False):
        tag = "dx" if need_dx else "frozen"
        g3 = measure(v3_bwd(need_dx), (x, table, gup), n_pts)
        g4 = measure(v4_bwd(need_dx), (x, gup, gpk), n_pts)
        print(f"bwd[{tag}]: v3 {g3:.4f} GS/s ({0.94 / g3:.1f} cyc/pt)  "
              f"v4 {g4:.4f} GS/s ({0.94 / g4:.1f} cyc/pt)  "
              f"speedup {g4 / g3:.2f}x", flush=True)

    # ---- fwd with/without the g store
    def fwd_plain(xx, tt):
        return jnp.sum(B._brick_encode_pallas(xx, tt, meta))

    def fwd_g(xx, tt):
        o, gp = B._brick_encode_pallas_g(xx, tt, meta)
        return jnp.sum(o) + jnp.sum(gp) * 1e-30

    gp_ = measure(fwd_plain, (x, table), n_pts)
    gg_ = measure(fwd_g, (x, table), n_pts)
    print(f"fwd: plain {gp_:.4f} GS/s  +g {gg_:.4f} GS/s "
          f"(overhead {100 * (1 - gg_ / gp_):.1f}%)", flush=True)

    # ---- end-to-end value_and_grad through the custom VJP (bench metric)
    def fwdbwd(xx, tt):
        def loss(t_, x_):
            return jnp.sum(B.brick_encode(x_, t_, meta, True) ** 2)

        l, (dt_, dx_) = jax.value_and_grad(loss, argnums=(0, 1))(tt, xx)
        return l + jnp.sum(dt_[0]) * 1e-30 + jnp.sum(dx_[0]) * 1e-30

    for ver in (4, 3):
        B._BWD_VERSION = ver
        gs = measure(fwdbwd, (x, table), n_pts)
        print(f"fwdbwd[v{ver}]: {gs:.4f} GS/s ({0.94 / gs:.1f} cyc/pt)",
              flush=True)
    B._BWD_VERSION = 4


if __name__ == "__main__":
    main()
