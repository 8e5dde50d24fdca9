"""Brick-layout LoTD encoding — the TPU-native fast path.

Motivation (measured on TPU v5e, see experiments/pallas_gather_probe.py):
random row gathers issue at ~250M rows/s through XLA and ~660M rows/s
through a fully-unrolled Pallas scalar loop — the gather ISSUE RATE, not
bandwidth, bounds any NGP-style encoding. The CUDA reference performs
8 corner-gathers per point per level; on TPU that is unaffordable.

TPU-native redesign: pack a 4×4×4-vertex **brick** (64 vertices × 2 feats)
into one 128-lane row. One row-gather per (point, level) fetches ALL eight
interpolation corners; corner extraction is an in-register lane gather
(`tpu.dynamic_gather`, ~vreg/cycle). Bricks cover 3×3×3 cells and overlap
by one vertex plane so every cell's corners live in a single brick.

  * Dense levels: bricks laid out in C order; canonical parameters remain
    the vertex grid — the brick table is materialized by a (cheap,
    table-sized) gather, so shared boundary vertices stay tied and the
    encoding is exactly the reference Dense function.
  * Hash levels: the spatial hash operates on **bricks** (NGP XOR-primes on
    brick coords). Parameters ARE brick rows; boundary vertices between
    bricks are independent copies (a deliberate capacity/speed trade — NGP
    hash features are already collision-discontinuous; PSNR parity is
    validated in tests).

Reference for behavior being replaced: csrc/lotd (kernel_lod Dense/Hash
paths); this file is a from-scratch TPU design, not a translation.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from functools import cached_property
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nr3d_lib_tpu.ops.lotd import HASH_PRIMES

__all__ = ["BrickMeta", "make_brick_meta", "brick_encode", "brick_encode_xla",
           "materialize_dense_brick_table", "vertex_grid_to_brick_rows",
           "BRICK_W", "LANES"]

Array = jax.Array

BRICK_W = 4           # vertices per axis in a brick
BRICK_CELLS = 3       # cells per axis covered (stride)
LANES = 128
N_FEAT = 2            # features per vertex (lane pairs)


@dataclass(frozen=True)
class BrickLevel:
    res: Tuple[int, int, int]        # vertex resolution per axis
    kind: str                        # 'dense' | 'hash'
    n_rows: int                      # brick rows in the table
    bricks_per_axis: Tuple[int, int, int]
    row_offset: int                  # into the concatenated table


@dataclass(frozen=True)
class BrickMeta:
    levels: Tuple[BrickLevel, ...]

    @cached_property
    def total_rows(self) -> int:
        return sum(l.n_rows for l in self.levels)

    @cached_property
    def n_params(self) -> int:
        return self.total_rows * LANES

    @cached_property
    def n_levels(self) -> int:
        return len(self.levels)

    @cached_property
    def out_features(self) -> int:
        return N_FEAT * len(self.levels)


def _bricks_per_axis(res: Sequence[int]) -> Tuple[int, ...]:
    # cells 0..res-2 → brick index cell//3 ∈ [0, ceil((res-1)/3))
    return tuple(int(math.ceil((r - 1) / BRICK_CELLS)) for r in res)


def make_brick_meta(lod_res: Sequence, lod_types: Sequence[str],
                    hashmap_rows: int = 4096) -> BrickMeta:
    """hashmap_rows: rows per hash level (capacity = rows·64 vertices)."""
    levels: List[BrickLevel] = []
    offset = 0
    for res, t in zip(lod_res, lod_types):
        if np.isscalar(res):
            res = (int(res),) * 3
        res = tuple(int(v) for v in res)
        bpa = _bricks_per_axis(res)
        t = t.lower()
        if t == "dense":
            n_rows = int(np.prod(bpa))
        elif t == "hash":
            n_rows = min(int(hashmap_rows), int(np.prod(bpa)))
            if n_rows == int(np.prod(bpa)):
                t = "dense"  # small enough: collision-free
        else:
            raise ValueError(f"brick backend supports Dense/Hash, got {t}")
        levels.append(BrickLevel(res, t, n_rows, bpa, offset))
        offset += n_rows
    return BrickMeta(tuple(levels))


# ------------------------------------------------------------------ indexing
def _level_rows_and_lanes(x: Array, level: BrickLevel):
    """Per-point brick row index, base corner lane, and fractional coords.

    x: [N, 3] in [0,1] (reference kernel convention, scale = res-2).
    Returns (row [N] int32, lane0 [N] int32, frac [N,3]).
    """
    res = jnp.asarray(level.res, x.dtype)
    v = x * (res - 2) + 0.5
    cell = jnp.floor(v)
    frac = v - jax.lax.stop_gradient(cell)
    cell = jnp.clip(cell.astype(jnp.int32), 0,
                    jnp.asarray([r - 2 for r in level.res]))
    brick = cell // BRICK_CELLS
    local = cell - brick * BRICK_CELLS            # ∈ [0, 2]
    bpa = level.bricks_per_axis
    brick = jnp.minimum(brick, jnp.asarray([b - 1 for b in bpa]))
    if level.kind == "dense":
        row = (brick[..., 0] * bpa[1] + brick[..., 1]) * bpa[2] + brick[..., 2]
    else:
        h = brick[..., 0].astype(jnp.uint32) * jnp.uint32(HASH_PRIMES[0])
        h = h ^ (brick[..., 1].astype(jnp.uint32) * jnp.uint32(HASH_PRIMES[1]))
        h = h ^ (brick[..., 2].astype(jnp.uint32) * jnp.uint32(HASH_PRIMES[2]))
        row = (h % jnp.uint32(level.n_rows)).astype(jnp.int32)
    lane0 = ((local[..., 0] * BRICK_W + local[..., 1]) * BRICK_W
             + local[..., 2]) * N_FEAT
    return row.astype(jnp.int32) + level.row_offset, lane0.astype(jnp.int32), frac


# corner lane offsets: corner (dx,dy,dz) → lane delta
_CORNER_OFF = np.asarray(
    [((dx * BRICK_W + dy) * BRICK_W + dz) * N_FEAT
     for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)], np.int32)  # [8]
_CORNER_BITS = np.asarray([(dx, dy, dz) for dx in (0, 1) for dy in (0, 1)
                           for dz in (0, 1)], np.float32)            # [8,3]


def _corner_weights(frac: Array) -> Array:
    """[N,3] → [N,8] trilinear weights."""
    cb = jnp.asarray(_CORNER_BITS, frac.dtype)                       # [8,3]
    w = frac[..., None, :] * cb + (1.0 - frac[..., None, :]) * (1.0 - cb)
    return jnp.prod(w, axis=-1)


# ------------------------------------------------------------- XLA reference
def brick_encode_xla(x: Array, table: Array, meta: BrickMeta) -> Array:
    """Pure-XLA reference implementation (slow gathers; used for tests,
    CPU execution, and higher-order autodiff fallback).

    table: [total_rows, 128]. Returns [N, 2·L].
    """
    outs = []
    for level in meta.levels:
        row, lane0, frac = _level_rows_and_lanes(x, level)
        rows = jnp.take(table, row, axis=0, mode="clip")             # [N,128]
        lanes = lane0[:, None] + jnp.asarray(_CORNER_OFF)[None, :]   # [N,8]
        f0 = jnp.take_along_axis(rows, lanes, axis=1)                # [N,8]
        f1 = jnp.take_along_axis(rows, lanes + 1, axis=1)
        w = _corner_weights(frac).astype(rows.dtype)                 # [N,8]
        outs.append(jnp.sum(w * f0, -1))
        outs.append(jnp.sum(w * f1, -1))
    return jnp.stack(outs, axis=-1)


# ----------------------------------------------------- dense materialization
def vertex_grid_to_brick_rows(level: BrickLevel) -> np.ndarray:
    """For a dense level: flat vertex index for every (row, lane) slot →
    [n_rows, 128] int32 (clamped at borders). Used to materialize the brick
    table from canonical vertex parameters so boundary vertices stay tied."""
    bx, by, bz = level.bricks_per_axis
    rx, ry, rz = level.res
    bxs, bys, bzs = np.meshgrid(np.arange(bx), np.arange(by), np.arange(bz),
                                indexing="ij")
    base = np.stack([bxs, bys, bzs], -1).reshape(-1, 1, 3) * BRICK_CELLS
    lx, ly, lz = np.meshgrid(np.arange(BRICK_W), np.arange(BRICK_W),
                             np.arange(BRICK_W), indexing="ij")
    local = np.stack([lx, ly, lz], -1).reshape(1, -1, 3)
    v = base + local                                                  # [R,64,3]
    v = np.minimum(v, np.asarray([rx - 1, ry - 1, rz - 1]))
    flat = (v[..., 0] * ry + v[..., 1]) * rz + v[..., 2]              # [R,64]
    lanes = np.zeros((flat.shape[0], LANES), np.int32)
    lanes[:, 0::2] = flat * N_FEAT
    lanes[:, 1::2] = flat * N_FEAT + 1
    return lanes


def materialize_dense_brick_table(vertex_params: Array, level: BrickLevel
                                  ) -> Array:
    """Canonical vertex params [res³·2] → brick rows [n_rows, 128].

    Differentiable: gradients flow back and ACCUMULATE onto shared vertices,
    keeping the encoding C0 like the reference Dense type."""
    idx = jnp.asarray(vertex_grid_to_brick_rows(level))
    return vertex_params[idx]


# -------------------------------------------------------------- pallas kernel
def _fwd_kernel(meta: BrickMeta, tile: int,
                row_ref, lane_ref, frac_ref, table_ref, out_ref, scratch_ref):
    """row_ref: SMEM [L, tile]; lane_ref: VMEM [L, tile]; frac: [L, tile, 3];
    table: VMEM [total_rows, 128]; out: [tile, 2L]; scratch: [tile, 128]."""
    from jax.experimental import pallas as pl

    n_levels = meta.n_levels

    # ---- gather pass for ALL levels: rolled outer loop × 32 inner loads
    # keeps the ~1.4 cycles/row of a full unroll at 32× less code (full
    # unroll of L·tile loads makes Mosaic compilation explode)
    INNER = 32

    def gather_body(i, _):
        base = i * INNER
        for k in range(INNER):
            n = base + k
            for l in range(n_levels):
                scratch_ref[pl.ds(l * tile + n, 1), :] = \
                    table_ref[pl.ds(row_ref[l, n], 1), :]
        return 0

    jax.lax.fori_loop(0, tile // INNER, gather_body, 0)

    # lane pattern: column c<16 wants corner k=c//2 feat f=c%2 at offset
    # ((k>>2)·16 + ((k>>1)&1)·4 + (k&1))·2 + f — pure iota arithmetic, and
    # the resulting lane never exceeds 127 even for c≥16, so no masking.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    k = col >> 1
    f = col & 1
    off_vec = (((k >> 2) & 1) * (BRICK_W * BRICK_W)
               + ((k >> 1) & 1) * BRICK_W + (k & 1)) * N_FEAT + f    # [1,128]

    cols = []
    for l in range(n_levels):
        lane0 = lane_ref[l, :]                                       # [tile]
        wanted = lane0[:, None] + off_vec                            # [tile,128]
        rows = scratch_ref[pl.ds(l * tile, tile), :]
        g = jnp.take_along_axis(rows, wanted, axis=1)[:, :16]        # [tile,16]

        # trilinear weights replicated per (corner, feat) lane: w16[:, 2k+f]
        frac = frac_ref[l, :, :]                                     # [tile,3]
        fx = frac[:, 0:1]
        fy = frac[:, 1:2]
        fz = frac[:, 2:3]
        c16 = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1) >> 1   # corner id
        bx = ((c16 >> 2) & 1).astype(g.dtype)
        by = ((c16 >> 1) & 1).astype(g.dtype)
        bz = (c16 & 1).astype(g.dtype)
        w16 = ((fx * bx + (1.0 - fx) * (1.0 - bx))
               * (fy * by + (1.0 - fy) * (1.0 - by))
               * (fz * bz + (1.0 - fz) * (1.0 - bz)))                # [tile,16]
        prod = g * w16
        # feat0 lanes are even, feat1 odd (3D reshape unsupported in Mosaic)
        par = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1) & 1
        even = (1 - par).astype(prod.dtype)
        odd = par.astype(prod.dtype)
        acc0 = jnp.sum(prod * even, axis=1, keepdims=True)           # [tile,1]
        acc1 = jnp.sum(prod * odd, axis=1, keepdims=True)
        cols.append(acc0)
        cols.append(acc1)
    out_ref[:, :] = jnp.concatenate(cols, axis=-1)


_MAX_CHUNK = 1 << 19  # Mosaic crashes on very large per-call shapes


def _brick_encode_pallas(x: Array, table: Array, meta: BrickMeta,
                         tile: int = 1024) -> Array:
    n = x.shape[0]
    if n > _MAX_CHUNK:
        # unrolled fixed-size chunks: one kernel compilation (cached across
        # chunks), any N. (lax.map makes XLA stack-allocate the full mapped
        # output in VMEM — avoid it.)
        k = (n + _MAX_CHUNK - 1) // _MAX_CHUNK
        xp = jnp.pad(x, ((0, k * _MAX_CHUNK - n), (0, 0)))
        outs = [_brick_encode_pallas_impl(xp[i * _MAX_CHUNK:(i + 1) * _MAX_CHUNK],
                                          table, meta, tile)
                for i in range(k)]
        return jnp.concatenate(outs, axis=0)[:n]
    return _brick_encode_pallas_impl(x, table, meta, tile)


def _brick_encode_pallas_impl(x: Array, table: Array, meta: BrickMeta,
                              tile: int = 1024) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    L = meta.n_levels

    rows, lanes, fracs = [], [], []
    for level in meta.levels:
        r, l0, fr = _level_rows_and_lanes(x, level)
        rows.append(r)
        lanes.append(l0)
        fracs.append(fr)
    row_arr = jnp.stack(rows)                 # [L, Np]
    lane_arr = jnp.stack(lanes)               # [L, Np]
    frac_arr = jnp.stack(fracs).astype(table.dtype)  # [L, Np, 3]

    kernel = functools.partial(_fwd_kernel, meta, tile)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((L, tile), lambda i: (0, i)),
            pl.BlockSpec((L, tile, 3), lambda i: (0, i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 2 * L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 2 * L), table.dtype),
        scratch_shapes=[pltpu.VMEM((L * tile, LANES), table.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(row_arr, lane_arr, frac_arr, table)
    return out[:n]


# ------------------------------------------------------------------ custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def brick_encode(x: Array, table: Array, meta: BrickMeta,
                 use_pallas: bool = True) -> Array:
    """Brick LoTD encode: [N,3] in [0,1] × [total_rows,128] → [N, 2L].

    Forward uses the fused Pallas kernel on TPU; backward currently uses the
    XLA reference formulation (differentiable to all orders)."""
    if use_pallas and jax.default_backend() == "tpu":
        return _brick_encode_pallas(x, table, meta)
    return brick_encode_xla(x, table, meta)


def _fwd(x, table, meta, use_pallas):
    return brick_encode(x, table, meta, use_pallas), (x, table)


def _bwd(meta, use_pallas, res, g):
    x, table = res
    _, vjp_fn = jax.vjp(lambda xx, tt: brick_encode_xla(xx, tt, meta), x, table)
    return vjp_fn(g)


brick_encode.defvjp(_fwd, _bwd)
