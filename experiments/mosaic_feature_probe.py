"""Mosaic capability + cost probes that gate the next kernel investments.

Run on the real TPU (takes ~2 min):  timeout 1200 python experiments/mosaic_feature_probe.py

Probes:
  1. bf16-unpack: inside a kernel, gather f32 rows whose lanes bit-pack two
     bf16 values, unpack via shift + pltpu.bitcast, compare vs host unpack.
     Gates the bf16-packed brick variant (4 feats/vertex at 1 gather —
     halves levels, and therefore scalar issues, per output feature).
  2. vreg-load: per-row dynamic gather of (8,128) f32 tiles vs (1,128) rows
     — does a fat sublane-aligned dynamic load amortize the scalar issue?
     Gates an 8x8x8-vertex "vreg brick" layout.
  3. bf16 one-hot matmul rate — can _MXU_MAX_ROWS rise with a bf16 onehot?
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048
ROWS = 4096


# ---------------------------------------------------------------- probe 1
def _unpack_kernel(idx_ref, tab_ref, lo_ref, hi_ref, buf):
    for k in range(TILE):
        buf[pl.ds(k, 1), :] = tab_ref[pl.ds(idx_ref[k], 1), :]
    u = pltpu.bitcast(buf[:, :], jnp.uint32)
    lo_ref[:, :] = pltpu.bitcast(u << 16, jnp.float32)
    hi_ref[:, :] = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)


def probe_bf16_unpack():
    key = jax.random.key(0)
    pair = jax.random.normal(key, (ROWS, 128, 2), jnp.bfloat16)
    u32 = (pair[..., 1].view(jnp.uint16).astype(jnp.uint32) << 16) | \
        pair[..., 0].view(jnp.uint16).astype(jnp.uint32)
    tab = jax.lax.bitcast_convert_type(u32, jnp.float32)
    idx = jax.random.randint(jax.random.key(1), (TILE,), 0, ROWS, jnp.int32)
    lo, hi = pl.pallas_call(
        _unpack_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((TILE, 128), lambda: (0, 0)),
                   pl.BlockSpec((TILE, 128), lambda: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((TILE, 128), jnp.float32),
                   jax.ShapeDtypeStruct((TILE, 128), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((TILE, 128), jnp.float32)],
    )(idx, tab)
    want_lo = pair[np.asarray(idx), :, 0].astype(jnp.float32)
    want_hi = pair[np.asarray(idx), :, 1].astype(jnp.float32)
    e0 = float(jnp.max(jnp.abs(lo - want_lo)))
    e1 = float(jnp.max(jnp.abs(hi - want_hi)))
    print(f"probe1 bf16-unpack: err lo={e0:.2e} hi={e1:.2e} "
          f"{'OK' if max(e0, e1) == 0 else 'MISMATCH'}", flush=True)


# ---------------------------------------------------------------- probe 2
def _row_gather_kernel(width, idx_ref, tab_ref, out_ref):
    n = TILE // width
    for k in range(n):
        out_ref[pl.ds(k * width, width), :] = \
            tab_ref[pl.ds(idx_ref[k], width), :]


def _chain(fn, n):
    def chained(c, idx, tab):
        def body(i, carry):
            cc, acc = carry
            s = jnp.sum(fn((idx + cc.astype(jnp.int32)) % (ROWS - 8), tab))
            return (s * 1e-30).astype(jnp.float32), acc + s

        return jax.lax.fori_loop(0, n, body, (c, jnp.float32(0)))[1]

    return jax.jit(chained)


def probe_vreg_load():
    tab = jax.random.normal(jax.random.key(0), (ROWS, 128), jnp.float32)
    for width in (1, 8):
        n_idx = TILE // width
        idx = jax.random.randint(jax.random.key(1), (n_idx,), 0,
                                 ROWS - width, jnp.int32)
        if width == 8:
            idx = (idx // 8) * 8          # sublane-aligned
        f = functools.partial(
            pl.pallas_call, functools.partial(_row_gather_kernel, width),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, 128), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((TILE, 128), jnp.float32))()
        fn = lambda i, t, f=f: f(i, t)
        lo, hi = _chain(fn, 4), _chain(fn, 64)
        float(lo(jnp.float32(0), idx, tab))
        float(hi(jnp.float32(0), idx, tab))

        def t(g):
            t0 = time.perf_counter()
            float(g(jnp.float32(0), idx, tab))
            return time.perf_counter() - t0

        dt = (min(t(hi) for _ in range(2)) - min(t(lo) for _ in range(2))) / 60
        per_issue = dt / n_idx
        print(f"probe2 width={width}: {n_idx} loads in {dt * 1e6:.1f} µs "
              f"→ {per_issue * 1e9:.2f} ns/load "
              f"({per_issue * 0.94e9:.2f} cyc)", flush=True)


# ---------------------------------------------------------------- probe 3
def _onehot_kernel(dtype, k_rows, idxv_ref, tab_ref, out_ref):
    rid = idxv_ref[:, 0:1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, k_rows), 1)
    onehot = (iota == rid).astype(dtype)
    out_ref[:, :] = jnp.dot(onehot, tab_ref[pl.ds(0, k_rows), :].astype(dtype),
                            preferred_element_type=jnp.float32)


def probe_onehot_rate():
    tab = jax.random.normal(jax.random.key(0), (ROWS, 128), jnp.float32)
    idx = jax.random.randint(jax.random.key(1), (TILE, 1), 0, ROWS,
                             jnp.int32)
    for dtype, k_rows in ((jnp.float32, 2048), (jnp.bfloat16, 2048),
                          (jnp.bfloat16, 4096)):
        f = pl.pallas_call(
            functools.partial(_onehot_kernel, dtype, k_rows),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, 128), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((TILE, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024))
        fn = lambda i, t, f=f: f(i, t)

        def chain(n):
            def chained(c, ii, tt):
                def body(j, carry):
                    cc, acc = carry
                    s = jnp.sum(fn((ii + cc.astype(jnp.int32)) % ROWS, tt))
                    return (s * 1e-30).astype(jnp.float32), acc + s

                return jax.lax.fori_loop(0, n, body, (c, jnp.float32(0)))[1]

            return jax.jit(chained)

        lo, hi = chain(4), chain(64)
        float(lo(jnp.float32(0), idx, tab))
        float(hi(jnp.float32(0), idx, tab))

        def t(g):
            t0 = time.perf_counter()
            float(g(jnp.float32(0), idx, tab))
            return time.perf_counter() - t0

        dt = (min(t(hi) for _ in range(2)) - min(t(lo) for _ in range(2))) / 60
        print(f"probe3 onehot {dtype.__name__} k={k_rows}: "
              f"{dt / TILE * 0.94e9:.2f} cyc/pt", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe_bf16_unpack()
    probe_vreg_load()
    probe_onehot_rate()
