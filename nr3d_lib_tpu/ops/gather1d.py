"""Pallas element gather: values[row[i], lane[i]] for large random index
streams.

XLA's gather on TPU issues ~125-250M elements/s; the scalar-loop row
gather issues ~0.9G rows/s (memory: tpu-env-pitfalls). For element lookups
from a SMALL 2D table (occupancy grids: 64³ → [4096, 64] f32 = 1 MB VMEM)
this kernel gathers whole rows at the fast rate and reduces the wanted
lane on the VPU/MXU — ~6× faster than `jnp.take` at 786k lookups.

Not differentiable (lookup tables only — occupancy bits, cell ids).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gather_rows_lanes"]

Array = jax.Array

_LANES = 128
_TILE = 2048
_MAX_CHUNK = 1 << 19


def _kernel(tile: int, row_ref, lane_ref, table_ref, m_ref, out_ref,
            scratch_ref):
    from jax.experimental import pallas as pl

    INNER = 64

    def body(i, _):
        base = i * INNER
        for k in range(INNER):
            n = base + k
            scratch_ref[pl.ds(n, 1), :] = \
                table_ref[pl.ds(row_ref[0, n], 1), :]
        return 0

    jax.lax.fori_loop(0, tile // INNER, body, 0)

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (tile, _LANES), 1)
    sel = jnp.where(lane_i == lane_ref[:, 0:1], 1.0, 0.0)
    picked = scratch_ref[:, :] * sel
    # 128→8 lane reduction on the MXU; XLA sums the remaining 8
    # HIGHEST: the MXU's default bf16 pass would truncate f32 values
    out_ref[:, :] = jnp.dot(picked, m_ref[:],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)


def _impl(values: Array, row: Array, lane: Array) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = row.shape[0]
    n_pad = ((n + _TILE - 1) // _TILE) * _TILE
    if n_pad != n:
        row = jnp.pad(row, (0, n_pad - n))
        lane = jnp.pad(lane, (0, n_pad - n))
    r_rows, r_lanes = values.shape
    if r_lanes < _LANES:
        values = jnp.pad(values, ((0, 0), (0, _LANES - r_lanes)))
    m = np.zeros((_LANES, 8), np.float32)
    for l in range(_LANES):
        m[l, l % 8] = 1.0

    out8 = pl.pallas_call(
        functools.partial(_kernel, _TILE),
        grid=(n_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_TILE, _LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(row[None].astype(jnp.int32), lane[:, None].astype(jnp.int32),
      values.astype(jnp.float32), jnp.asarray(m))
    return jnp.sum(out8, axis=-1)[:n]


def gather_rows_lanes(values: Array, row: Array, lane: Array) -> Array:
    """values [R, C≤128] f32; row/lane [...] int32 → values[row, lane] [...]

    Falls back to `jnp.take` off-TPU. `values` should be small enough to
    reside in VMEM (≲ 16 MB)."""
    shape = row.shape
    row = row.reshape(-1)
    lane = lane.reshape(-1)
    if jax.default_backend() != "tpu":
        flat = row * values.shape[1] + lane
        return jnp.take(values.reshape(-1), flat, mode="clip").reshape(shape)
    return jax.lax.stop_gradient(
        _impl(values, row, lane)).reshape(shape)
