"""Probe: batch the gather loop's scratch stores 8-at-a-time.

The v3 brick kernel's gather loop issues, per row, one dynamic (1,128)
VMEM load + one (1,128) scratch store through the scalar pipe — measured
1.76 cyc/row in-kernel (1.42 standalone). Stores to scratch are at
CONSECUTIVE offsets, so 8 of them can become one aligned (8,128) store if
the 8 loaded rows are first packed into one value (sublane concat = VPU
work, a separate pipe). If packing is free (hidden behind the loads),
1.76 → ~1.1 cyc/row ⇒ fwd encode 15 → ~10 cyc/pt.

Variants (all: idx random in [0,S), table VMEM-resident, out [N,128]):
  A  per-row load + per-row store            (current _gather_phase inner)
  B  8× load → jnp.concatenate → 1 store     (batched store)
  C  4× load → concat → 1 (4,128) store      (half batch)
  D  8× load, accumulate-sum only, 1 store per 64 (load-issue floor ref)

OUTCOME (round 4): this standalone probe hung >30 min in the congested
remote Mosaic compiler and was abandoned; the decision A/B ran on the
PRODUCTION kernel instead via `lotd_brick._STORE_BATCH` (bench-identical
wrapper, so the sb=1 leg cache-hits): sb=1 14.78 cyc/pt, sb=4 14.82,
sb=8 13.39 (0.0702 GS/s) → sb=8 shipped as the default. Kept for the
variant-D load-floor question if the compiler service recovers.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

S = 4096            # rows (VMEM-resident, like a hash level)
N = 1 << 19         # gathered rows per call
TILE = 2048
GHZ = 0.94


def _t(f, x):
    t0 = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t0


def chain_time(run, idx, table, n_hi=9):
    def chained(n, c, ii, tt):
        def body(i, carry):
            cc, acc = carry
            s = run(ii + (cc != 0.0).astype(jnp.int32), tt)
            return (s * 1e-30).astype(jnp.float32), acc + s
        return jax.lax.fori_loop(0, n, body, (c, jnp.float32(0)))[1]

    f = jax.jit(chained, static_argnums=0)
    float(f(1, 0.0, idx, table))
    float(f(n_hi, 0.0, idx, table))
    t_lo = min(_t(functools.partial(f, 1, 0.0, idx), table) for _ in range(3))
    t_hi = min(_t(functools.partial(f, n_hi, 0.0, idx), table) for _ in range(3))
    return (t_hi - t_lo) / (n_hi - 1)


def make_run(variant):
    def kernel(idx_ref, table_ref, out_ref):
        def body(j, _):
            base = j * 64
            if variant == "A":
                for k in range(64):
                    out_ref[pl.ds(base + k, 1), :] = \
                        table_ref[pl.ds(idx_ref[0, base + k], 1), :]
            elif variant == "B":
                for k in range(0, 64, 8):
                    rows = jnp.concatenate(
                        [table_ref[pl.ds(idx_ref[0, base + k + i], 1), :]
                         for i in range(8)], axis=0)
                    out_ref[pl.ds(base + k, 8), :] = rows
            elif variant == "C":
                for k in range(0, 64, 4):
                    rows = jnp.concatenate(
                        [table_ref[pl.ds(idx_ref[0, base + k + i], 1), :]
                         for i in range(4)], axis=0)
                    out_ref[pl.ds(base + k, 4), :] = rows
            elif variant == "D":
                acc = jnp.zeros((1, 128), jnp.float32)
                for k in range(64):
                    acc = acc + table_ref[pl.ds(idx_ref[0, base + k], 1), :]
                out_ref[pl.ds(base, 1), :] = acc
            return 0

        jax.lax.fori_loop(0, TILE // 64, body, 0)

    def run(idx, table):
        # idx rides SMEM as [1, N] (scalar-read like the production kernel)
        out = pl.pallas_call(
            kernel,
            grid=(N // TILE,),
            in_specs=[pl.BlockSpec((1, TILE), lambda i: (0, i),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        )(idx[None, :], table)
        return jnp.sum(out[::4096]).astype(jnp.float32)

    return run


def main():
    variants = sys.argv[1:] or ["A", "B", "C", "D"]
    k1, k2 = jax.random.split(jax.random.key(0))
    table = jax.random.normal(k1, (S, 128), jnp.float32)
    idx = jax.random.randint(k2, (N,), 0, S, jnp.int32)
    for v in variants:
        try:
            dt = chain_time(make_run(v), idx, table)
            cyc = dt * GHZ * 1e9 / N
            print(f"variant {v}: {dt*1e3:.3f} ms/call  {cyc:.2f} cyc/row  "
                  f"{N/dt/1e9:.3f} Grows/s", flush=True)
        except Exception as e:
            print(f"variant {v}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
