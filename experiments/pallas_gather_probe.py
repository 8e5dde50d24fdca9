"""Probe: which gather formulations does Mosaic TPU support, and how fast?

The LoTD encode is gather-bound. All tables fit in VMEM (~12 MB), so if
Pallas can do a vectorized VMEM gather we win big. This probes:
  A. out = table[idx] with table [S, F] in VMEM, idx [N] int32 (row gather)
  B. jnp.take(table, idx, axis=0)
  C. one-hot matmul for small tables (MXU fallback)
Timing via the chained-iteration trick (see bench.py).
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain_time(make_step, n_lo=1, n_hi=9):
    """Per-iteration seconds via differenced chained runs.

    make_step: scalar float32 perturbation -> scalar float32 result."""
    def chained(n):
        def body(i, carry):
            c, acc = carry
            s = make_step(c + i.astype(jnp.float32) * 0.0)
            return s * 1e-30, acc + s

        return jax.jit(lambda c: jax.lax.fori_loop(0, n, body, (c, 0.0))[1])

    f_lo, f_hi = chained(n_lo), chained(n_hi)
    float(f_lo(0.0))
    float(f_hi(0.0))
    t_lo = min(_t(f_lo, 0.0) for _ in range(2))
    t_hi = min(_t(f_hi, 0.0) for _ in range(2))
    return (t_hi - t_lo) / (n_hi - n_lo)


def _t(f, x):
    t0 = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t0


S = 2 ** 19         # hash table rows
F = 128             # row width (lanes)
N = 1 << 20         # gathered rows per call
TILE_N = 2048

key = jax.random.key(0)
k1, k2 = jax.random.split(key)
table = jax.random.normal(k1, (S, F), jnp.float32)
idx0 = jax.random.randint(k2, (N,), 0, S, jnp.int32)


def probe_a_pallas_row_gather():
    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = table_ref[idx_ref[:], :]

    @jax.jit
    def run(idx):
        return pl.pallas_call(
            kernel,
            grid=(N // TILE_N,),
            in_specs=[
                pl.BlockSpec((TILE_N,), lambda i: (i,)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((TILE_N, F), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        )(idx, table)

    out = run(idx0)
    ref = np.asarray(table)[np.asarray(idx0[:64])]
    np.testing.assert_allclose(np.asarray(out[:64]), ref, rtol=1e-6)
    dt = chain_time(lambda c: jnp.sum(run((idx0 + c.astype(jnp.int32)) % S)))
    print(f"A pallas row gather: {dt*1e3:.3f} ms → {N/dt/1e9:.3f} Grows/s, "
          f"{N*F*4/dt/1e9:.1f} GB/s")


def probe_a2_pallas_vmem_table():
    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = table_ref[idx_ref[:], :]

    @jax.jit
    def run(idx):
        return pl.pallas_call(
            kernel,
            grid=(N // TILE_N,),
            in_specs=[
                pl.BlockSpec((TILE_N,), lambda i: (i,)),
                pl.BlockSpec((S, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_N, F), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(S * F * 4 + 8 * 1024 * 1024)),
        )(idx, table)

    out = run(idx0)
    ref = np.asarray(table)[np.asarray(idx0[:64])]
    np.testing.assert_allclose(np.asarray(out[:64]), ref, rtol=1e-6)
    dt = chain_time(lambda c: jnp.sum(run((idx0 + c.astype(jnp.int32)) % S)))
    print(f"A2 pallas VMEM-table gather: {dt*1e3:.3f} ms → {N/dt/1e9:.3f} Grows/s")


def probe_b_xla_take():
    @jax.jit
    def run(idx):
        return jnp.take(table, idx, axis=0, mode="clip")

    dt = chain_time(lambda c: jnp.sum(run((idx0 + c.astype(jnp.int32)) % S)))
    print(f"B xla take [S,{F}]: {dt*1e3:.3f} ms → {N/dt/1e9:.3f} Grows/s, "
          f"{N*F*4/dt/1e9:.1f} GB/s")


def probe_b2_xla_take_narrow():
    table2 = table[:, :2]

    @jax.jit
    def run(idx):
        return jnp.take(table2, idx, axis=0, mode="clip")

    dt = chain_time(lambda c: jnp.sum(run((idx0 + c.astype(jnp.int32)) % S)))
    print(f"B2 xla take [S,2]: {dt*1e3:.3f} ms → {N/dt/1e9:.3f} Grows/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    probes = {"a": probe_a_pallas_row_gather, "a2": probe_a2_pallas_vmem_table,
              "b": probe_b_xla_take, "b2": probe_b2_xla_take_narrow}
    for name, fn in probes.items():
        if which not in ("all", name):
            continue
        try:
            fn()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
