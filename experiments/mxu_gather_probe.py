"""A/B the one-hot MXU gather (`_mxu_levels`) on the real TPU.

Sweeps _MXU_MAX_ROWS ∈ {0 (off), 128, 2048, 16384} for the bench config
(8 levels 16→2048; row counts 125 / 1331 / 9261 / 5×4096) and reports fwd
and fwd+bwd chained throughput + numerical parity vs the all-scalar kernel.

Hypothesis (docs/DESIGN.md §3): the scalar gather pipe is the bottleneck
(~1.76 cyc/row); each MXU'd level removes ~2 scalar issues/pt while its
one-hot compare costs ~k_pad/1024 VPU cyc/pt and its matmul rides the idle
MXU. Expected: 2048 cap (levels 0-1 MXU) → ~15.0 → ~11.5 cyc/pt fwd.

Run: timeout 3000 python experiments/mxu_gather_probe.py [block]
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


def chain(fn, n, n_args):
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


def measure(fn, args, n_pts, n_hi=8):
    lo, hi = chain(fn, 1, len(args)), chain(fn, n_hi, len(args))
    float(lo(0.0, *args))
    float(hi(0.0, *args))
    t_lo = min(_t(lo, *args) for _ in range(2))
    t_hi = min(_t(hi, *args) for _ in range(2))
    return n_pts / ((t_hi - t_lo) / (n_hi - 1)) / 1e9


def main():
    blk = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    meta = B.make_brick_meta(
        [16, 32, 64, 128, 256, 512, 1024, 2048],
        ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash", "Hash", "Hash"],
        hashmap_rows=4096)
    n_pts = 3_600_000
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    table = jax.random.normal(k1, (meta.total_rows, 128), jnp.float32) * 1e-2
    x = jax.random.uniform(k2, (n_pts, 3), jnp.float32)
    gup = jax.random.normal(k3, (n_pts, 2 * meta.n_levels), jnp.float32)
    B._FWD_VERSION = 3
    B._FWD_BLOCK = blk

    def fwd(xx, tt):
        return B._brick_encode_pallas(xx, tt, meta)

    def fwd_sum(xx, tt):
        return jnp.sum(fwd(xx, tt).astype(jnp.float32))

    def bwd_sum(xx, tt, gg):
        dx, dtab = B._brick_bwd_pallas(xx, tt, gg, meta, need_dx=True)
        return jnp.sum(dx.astype(jnp.float32)) + \
            jnp.sum(dtab.astype(jnp.float32))

    y_ref = dx_ref = dt_ref = None
    for cap in (0, 128, 2048, 16384):
        B._MXU_DENSE = cap > 0
        B._MXU_MAX_ROWS = cap
        n_mxu = len(B._mxu_levels(meta))
        y = jax.jit(lambda xx, tt: fwd(xx, tt))(x, table)
        dx, dtab = jax.jit(lambda xx, tt, gg: B._brick_bwd_pallas(
            xx, tt, gg, meta))(x, table, gup)
        if y_ref is None:
            y_ref, dx_ref, dt_ref = y, dx, dtab
            err = (0.0, 0.0, 0.0)
        else:
            err = (float(jnp.max(jnp.abs(y - y_ref))),
                   float(jnp.max(jnp.abs(dx - dx_ref))),
                   float(jnp.max(jnp.abs(dtab - dt_ref))))
        gs_f = measure(fwd_sum, (x, table), n_pts)
        gs_b = measure(bwd_sum, (x, table, gup), n_pts)
        print(f"cap={cap:>6} mxu_levels={n_mxu}: "
              f"fwd {gs_f:.4f} GS/s ({0.94 / gs_f:.1f} cyc/pt)  "
              f"fwd+bwd-only {gs_b:.4f} GS/s ({0.94 / gs_b:.1f} cyc/pt)  "
              f"err y={err[0]:.2e} dx={err[1]:.2e} dtab={err[2]:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
