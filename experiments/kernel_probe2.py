"""Round-2 probes for the LoTD brick kernel redesign.

Questions (see VERDICT.md #1 and memory: lotd-brick-design):
  1. vpu   — VPU issue rate: chained FMAs on [T,128] f32 → vreg-ops/s.
  2. take1 — take_along_axis(axis=1) rate on [T,128].
  3. take0 — is take_along_axis(axis=0) on [8,128] supported + rate.
  4. big   — does a single pallas_call grid at 3.6M points still crash
             Mosaic (round-1: crash at >2^19 per-call points)?
  5. pred  — group-predicated gather: lax.cond(uniform → 1 load, else 8)
             on all-uniform vs never-uniform index streams.
  6. mix   — do scalar row-gathers and vector FMAs dual-issue when
             interleaved in one unrolled block?

Run: timeout 1200 python experiments/kernel_probe2.py [probe ...]
"""

import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLK = 0.94e9  # v5e nominal clock


def _t(f, x):
    t0 = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t0


def chain_time(make_step, n_lo=1, n_hi=5):
    def chained(n):
        def body(i, carry):
            c, acc = carry
            s = make_step(c + i.astype(jnp.float32) * 0.0)
            return s * 1e-30, acc + s
        return jax.jit(lambda c: jax.lax.fori_loop(0, n, body, (c, 0.0))[1])

    f_lo, f_hi = chained(n_lo), chained(n_hi)
    float(f_lo(0.0)); float(f_hi(0.0))
    t_lo = min(_t(f_lo, 0.0) for _ in range(2))
    t_hi = min(_t(f_hi, 0.0) for _ in range(2))
    return (t_hi - t_lo) / (n_hi - n_lo)


# ---------------------------------------------------------------- 1. vpu rate
def probe_vpu():
    T, K = 4096, 64  # K chained FMAs over [T,128]

    def kernel(x_ref, o_ref):
        y = x_ref[:]
        for _ in range(K):
            y = y * 1.000001 + 0.000001
        o_ref[:] = y

    N = 1 << 20

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(N // T,),
            in_specs=[pl.BlockSpec((T, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        )(x)

    x0 = jax.random.normal(jax.random.key(0), (N, 128), jnp.float32)
    dt = chain_time(lambda c: jnp.sum(run(x0 + c)))
    vregs = (N // 8) * K  # one (8,128) vreg op per FMA per 8 rows
    print(f"vpu: {dt*1e3:.3f} ms → {vregs/dt/1e9:.2f} G vreg-ops/s "
          f"({vregs/dt/CLK:.2f} ops/cycle)")


# ------------------------------------------------------------- 2. take axis=1
def probe_take1():
    T, K = 4096, 16

    def kernel(x_ref, i_ref, o_ref):
        y = x_ref[:]
        idx = i_ref[:]
        for _ in range(K):
            y = jnp.take_along_axis(y, idx, axis=1) + 1e-7
        o_ref[:] = y

    N = 1 << 20

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            grid=(N // T,),
            in_specs=[pl.BlockSpec((T, 128), lambda i: (i, 0)),
                      pl.BlockSpec((T, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        )(x, idx)

    k1, k2 = jax.random.split(jax.random.key(0))
    x0 = jax.random.normal(k1, (N, 128), jnp.float32)
    idx = jax.random.randint(k2, (N, 128), 0, 128, jnp.int32)
    dt = chain_time(lambda c: jnp.sum(run(x0 + c, idx)))
    vregs = (N // 8) * K * 2  # take + add
    print(f"take1: {dt*1e3:.3f} ms → {vregs/dt/1e9:.2f} G vreg-ops/s "
          f"({vregs/dt/CLK:.2f} ops/cycle)")


# ------------------------------------------------------------- 3. take axis=0
def probe_take0():
    T = 1024  # points per tile; loop over T//8 vregs

    def kernel(x_ref, i_ref, o_ref):
        # x: [8,128] table vreg; i: [T,128] sublane indices; o: [T,128]
        tab = x_ref[:]
        for v in range(T // 8):
            idx = i_ref[pl.ds(v * 8, 8), :]
            o_ref[pl.ds(v * 8, 8), :] = jnp.take_along_axis(tab, idx, axis=0)

    N = 1 << 18

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            grid=(N // T,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0)),
                      pl.BlockSpec((T, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        )(tab, idx)

    k1, k2 = jax.random.split(jax.random.key(0))
    tab = jax.random.normal(k1, (8, 128), jnp.float32)
    idx = jax.random.randint(k2, (N, 128), 0, 8, jnp.int32)
    out = run(tab, idx)
    ref = np.take_along_axis(np.asarray(tab)[None].repeat(8, 0).reshape(8, 8, 128)[0],
                             np.asarray(idx[:8]), axis=0)
    np.testing.assert_allclose(np.asarray(out[:8]), ref, rtol=1e-6)
    dt = chain_time(lambda c: jnp.sum(run(tab + c, idx)))
    vregs = N // 8
    print(f"take0 ([8,128] sublane gather): OK, {dt*1e3:.3f} ms → "
          f"{vregs/dt/1e9:.2f} G vreg-ops/s ({vregs/dt/CLK:.2f} ops/cycle)")


# --------------------------------------------------- 4. big single pallas_call
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
        out.block_until_ready()
        dt = chain_time(lambda c: jnp.sum(run(x0 * (1.0 + c * 1e-30))))
        print(f"big: single pallas_call at 3.6M COMPILES. {dt*1e3:.2f} ms → "
              f"{n/dt/1e9:.4f} GS/s")
    except Exception as e:
        print(f"big: FAILED {type(e).__name__}: {str(e)[:400]}")


# ------------------------------------------------ 5. group-predicated gather
def probe_pred():
    T, G, L = 1024, 8, 8  # tile, group size, levels
    S = 32768

    def kernel(rows_ref, tab_ref, o_ref, scratch):
        # rows_ref: SMEM [L, T]; group-uniform flag computed on the fly
        def body(gi, _):
            base = gi * G
            for l in range(L):
                r0 = rows_ref[l, base]
                rlast = rows_ref[l, base + G - 1]

                def uniform(_):
                    row = tab_ref[pl.ds(r0, 1), :]
                    for k in range(G):
                        scratch[pl.ds(l * T + base + k, 1), :] = row
                    return 0

                def mixed(_):
                    for k in range(G):
                        scratch[pl.ds(l * T + base + k, 1), :] = \
                            tab_ref[pl.ds(rows_ref[l, base + k], 1), :]
                    return 0

                jax.lax.cond(r0 == rlast, uniform, mixed, 0)
        return jax.lax.fori_loop(0, T // G, body, 0), None

    def kernel_wrap(rows_ref, tab_ref, o_ref, scratch):
        kernel(rows_ref, tab_ref, o_ref, scratch)
        o_ref[:] = scratch[pl.ds(0, T), :] + scratch[pl.ds((L - 1) * T, T), :]

    N = 1 << 18

    @jax.jit
    def run(rows, tab):
        return pl.pallas_call(
            kernel_wrap,
            grid=(N // T,),
            in_specs=[pl.BlockSpec((L, T), lambda i: (0, i),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((L * T, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(rows, tab)

    tab = jax.random.normal(jax.random.key(1), (S, 128), jnp.float32)
    # all-uniform rows: every group of 8 shares one row
    ru = jax.random.randint(jax.random.key(2), (L, N // G), 0, S, jnp.int32)
    rows_uni = jnp.repeat(ru, G, axis=1)
    # never-uniform
    rows_rnd = jax.random.randint(jax.random.key(3), (L, N), 0, S - 2, jnp.int32)
    rows_rnd = rows_rnd.at[:, G - 1::G].set(
        (rows_rnd[:, G - 1::G] + 1) % (S - 1))  # force mismatch

    for name, rows in [("uniform", rows_uni), ("mixed", rows_rnd)]:
        try:
            dt = chain_time(lambda c, rows=rows: jnp.sum(
                run((rows + c.astype(jnp.int32)) % S, tab)))
            gathers = N * L
            print(f"pred[{name}]: {dt*1e3:.3f} ms → "
                  f"{gathers/dt/1e9:.3f} G eff-gathers/s "
                  f"({dt*CLK/N:.1f} cyc/pt for {L} levels)")
        except Exception as e:
            print(f"pred[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}")


# --------------------------------------------------- 6. gather/VPU dual issue
def probe_mix():
    T, L = 1024, 8
    S = 32768
    K_FMA = 40  # vector FMAs interleaved per 32 gathers

    def make_kernel(do_gather, do_fma):
        def kernel(rows_ref, tab_ref, x_ref, o_ref, scratch):
            INNER = 32
            y = x_ref[:]

            def body(i, y):
                base = i * INNER
                if do_gather:
                    for k in range(INNER):
                        n = base + k
                        scratch[pl.ds(n % T, 1), :] = \
                            tab_ref[pl.ds(rows_ref[0, n % T], 1), :]
                if do_fma:
                    for _ in range(K_FMA // 8):
                        y = y * 1.000001 + 1e-9
                return y

            y = jax.lax.fori_loop(0, (T * L) // INNER, body, y)
            o_ref[:] = y + scratch[pl.ds(0, T), :]
        return kernel

    N = 1 << 17

    def build(do_gather, do_fma):
        @jax.jit
        def run(rows, tab, x):
            return pl.pallas_call(
                make_kernel(do_gather, do_fma),
                grid=(N // T,),
                in_specs=[pl.BlockSpec((1, T), lambda i: (0, i),
                                       memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec((T, 128), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((T, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(rows, tab, x)
        return run

    rows = jax.random.randint(jax.random.key(4), (1, N), 0, S, jnp.int32)
    tab = jax.random.normal(jax.random.key(5), (S, 128), jnp.float32)
    x0 = jax.random.normal(jax.random.key(6), (N, 128), jnp.float32)

    times = {}
    for name, (g, f) in [("gather", (True, False)), ("fma", (False, True)),
                         ("both", (True, True))]:
        run = build(g, f)
        dt = chain_time(lambda c, run=run: jnp.sum(run(rows, tab, x0 + c)))
        times[name] = dt
        print(f"mix[{name}]: {dt*1e3:.3f} ms")
    s, m = times["gather"] + times["fma"], times["both"]
    print(f"mix: sum={s*1e3:.3f} ms, both={m*1e3:.3f} ms → "
          f"overlap factor {s/m:.2f} (2.0 = perfect dual-issue)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["vpu", "take1", "take0", "pred", "mix", "big"]
    probes = {"vpu": probe_vpu, "take1": probe_take1, "take0": probe_take0,
              "big": probe_big, "pred": probe_pred, "mix": probe_mix}
    for name in which:
        try:
            probes[name]()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}")
