"""Slim round-2 probes (compile latency ~80s/variant → keep variants few).

  pred — group-predicated gather (lax.cond in gather loop): compiles? rate
         on uniform vs mixed index streams?
  big  — single pallas_call grid at 3.6M points (round-1 Mosaic crash check).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLK = 0.94e9


def timeit(run, x, n_hi=5):
    """Differenced chained timing (see memory: tpu-env-pitfalls)."""
    def chained(n):
        def body(i, carry):
            c, acc = carry
            s = jnp.sum(run((x + c.astype(x.dtype)) % jnp.asarray(32768, x.dtype)))
            return s.astype(jnp.float32) * 1e-30, acc + s.astype(jnp.float32)
        return jax.jit(lambda c: jax.lax.fori_loop(0, n, body, (c, 0.0))[1])

    f1, f5 = chained(1), chained(n_hi)
    float(f1(0.0)); float(f5(0.0))
    t1 = min(_t(f1) for _ in range(2))
    t5 = min(_t(f5) for _ in range(2))
    return (t5 - t1) / (n_hi - 1)


def _t(f):
    t0 = time.perf_counter()
    float(f(0.0))
    return time.perf_counter() - t0


def probe_pred():
    T, G, L, S = 2048, 16, 8, 32768
    N = 1 << 18

    def kernel(rows_ref, uni_ref, tab_ref, o_ref, scratch):
        def body(i, _):
            g = i % (T // G)
            l = i // (T // G)
            base = g * G

            def uniform(_):
                row = tab_ref[pl.ds(rows_ref[l, base], 1), :]
                b = jnp.broadcast_to(row, (8, 128))
                scratch[pl.ds(l * T + base, 8), :] = b
                scratch[pl.ds(l * T + base + 8, 8), :] = b
                return 0

            def mixed(_):
                for k in range(G):
                    scratch[pl.ds(l * T + base + k, 1), :] = \
                        tab_ref[pl.ds(rows_ref[l, base + k], 1), :]
                return 0

            jax.lax.cond(uni_ref[l, g] > 0, uniform, mixed, 0)
            return 0

        jax.lax.fori_loop(0, L * (T // G), body, 0)
        o_ref[:] = scratch[pl.ds(0, T), :] + scratch[pl.ds((L - 1) * T, T), :]

    @jax.jit
    def run(rows, tab):
        uni = (rows.reshape(L, N // G, G).min(-1)
               == rows.reshape(L, N // G, G).max(-1)).astype(jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=(N // T,),
            in_specs=[
                pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.SMEM),
                pl.BlockSpec((L, T // G), lambda i: (0, i),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((L * T, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(rows, uni, tab)

    tab = jax.random.normal(jax.random.key(1), (S, 128), jnp.float32)
    ru = jax.random.randint(jax.random.key(2), (L, N // G), 0, S, jnp.int32)
    rows_uni = jnp.repeat(ru, G, axis=1)
    rows_rnd = jax.random.randint(jax.random.key(3), (L, N), 0, S, jnp.int32)

    out = run(rows_uni, tab)
    exp = np.asarray(tab)[np.asarray(rows_uni[0, :8])] \
        + np.asarray(tab)[np.asarray(rows_uni[L - 1, :8])]
    np.testing.assert_allclose(np.asarray(out[:8]), exp, rtol=1e-6)
    print("pred: correctness OK")
    for name, rows in [("uniform", rows_uni), ("mixed", rows_rnd)]:
        dt = timeit(lambda r: run(r, tab), rows)
        print(f"pred[{name}]: {dt*1e3:.3f} ms → {dt*CLK/N:.2f} cyc/pt "
              f"({N*L/dt/1e9:.3f} G eff-gathers/s)", flush=True)


def probe_big():
    sys.path.insert(0, "/root/repo")
    from nr3d_lib_tpu.ops import lotd_brick as B
    meta = B.make_brick_meta(
        [16, 32, 64, 128, 256, 512, 1024, 2048],
        ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash", "Hash", "Hash"],
        hashmap_rows=4096)
    n = 3_600_000
    k1, k2 = jax.random.split(jax.random.key(0))
    table = jax.random.normal(k1, (meta.total_rows, 128), jnp.float32)
    x0 = jax.random.uniform(k2, (n, 3), jnp.float32)
    try:
        run = jax.jit(lambda xx: B._brick_encode_pallas_impl(xx, table, meta))
        out = run(x0)
        float(out[0, 0])
        t0 = time.perf_counter()
        s = float(jnp.sum(run(x0 * 1.0000001)))
        dt1 = time.perf_counter() - t0
        print(f"big: single pallas_call at 3.6M COMPILES; one timed call "
              f"(incl ~1s readback) {dt1*1e3:.1f} ms", flush=True)
    except Exception as e:
        print(f"big: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["big", "pred"]):
        try:
            {"pred": probe_pred, "big": probe_big}[name]()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
