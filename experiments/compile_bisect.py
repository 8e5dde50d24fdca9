"""Bisect Mosaic compile-time blowup in the v2 brick kernel.

Each variant compiles a stripped kernel body at tile=512, grid=1 in THIS
process with a wall-clock print — run one variant per process:
    python experiments/compile_bisect.py A|B|C|D|E
"""

import sys
import time

sys.path.insert(0, "/root/repo")   # NOT via PYTHONPATH: that breaks the
                                   # axon plugin's startup registration

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nr3d_lib_tpu.ops import lotd_brick as B

TILE = 512
L = 8


def make_kernel(variant):
    meta = B.make_brick_meta(
        [16, 32, 64, 128, 256, 512, 1024, 2048],
        ["Dense", "Dense", "Dense", "Hash", "Hash", "Hash", "Hash", "Hash"],
        hashmap_rows=4096)

    def kernel(rows_ref, lane_ref, frac_ref, table_ref, m_ref, out_ref,
               scratch_ref):
        # gather phase (always on)
        INNER = 32

        def gather_body(i, _):
            base = i * INNER
            for k in range(INNER):
                n = base + k
                for l in range(L):
                    scratch_ref[pl.ds(l * TILE + n, 1), :] = \
                        table_ref[pl.ds(rows_ref[l, n], 1), :]
            return 0

        jax.lax.fori_loop(0, TILE // INNER, gather_body, 0)

        if variant == "A":          # gather only
            out_ref[:, :] = jnp.dot(scratch_ref[pl.ds(0, TILE), :], m_ref[:],
                                    preferred_element_type=jnp.float32)
            return

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
        lvl = lane_i >> 4
        q = lane_i & 15
        k = q >> 1
        bx, by, bz = (k >> 2) & 1, (k >> 1) & 1, k & 1
        off = (bx * 16 + by * 4 + bz) * 2 + (q & 1)
        lane_pad = lane_ref[:]
        lvl_c = jnp.minimum(lvl, L - 1)
        lane0 = jnp.take_along_axis(
            jnp.pad(lane_pad, ((0, 0), (0, 128 - lane_pad.shape[1]))),
            lvl_c, axis=1)
        wanted = lane0 + off

        if variant == "B":          # ONE take_along_axis + matmul
            rows = scratch_ref[pl.ds(0, TILE), :]
            g = jnp.take_along_axis(rows, wanted, axis=1)
            out_ref[:, :] = jnp.dot(g, m_ref[:],
                                    preferred_element_type=jnp.float32)
            return

        g = jnp.zeros((TILE, 128), jnp.float32)
        for l in range(L):
            rows = scratch_ref[pl.ds(l * TILE, TILE), :]
            g_l = jnp.take_along_axis(rows, wanted, axis=1)
            g = jnp.where(lvl == l, g_l, g)

        if variant == "C":          # 8x take_along_axis + where + matmul
            out_ref[:, :] = jnp.dot(g, m_ref[:],
                                    preferred_element_type=jnp.float32)
            return

        frac_pad = jnp.pad(frac_ref[:],
                           ((0, 0), (0, 128 - frac_ref.shape[1])))
        s = []
        for a, bit in enumerate((bx, by, bz)):
            f_a = jnp.take_along_axis(frac_pad,
                                      jnp.minimum(3 * lvl_c + a, 127), axis=1)
            s.append(jnp.where(bit > 0, f_a, 1.0 - f_a))
        w = s[0] * s[1] * s[2]

        # D: full fwd body
        out_ref[:, :] = jnp.dot(g * w, m_ref[:],
                                preferred_element_type=jnp.float32)

    return meta, kernel


def main():
    variant = sys.argv[1]
    meta, kernel = make_kernel(variant)
    rows = jnp.zeros((L, TILE), jnp.int32)
    lane = jnp.zeros((TILE, L), jnp.int32)
    frac = jnp.zeros((TILE, 3 * L), jnp.float32)
    table = jnp.zeros((meta.total_rows, 128), jnp.float32)
    m = jnp.zeros((128, 2 * L), jnp.float32)

    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((L, TILE), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, L), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 3 * L), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 2 * L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((TILE, 2 * L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((L * TILE, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    t0 = time.time()
    y = jax.jit(f)(rows, lane, frac, table, m)
    y.block_until_ready()
    print(f"variant {variant}: compile+run {time.time() - t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
