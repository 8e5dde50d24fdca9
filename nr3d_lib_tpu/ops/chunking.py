"""Chunked execution of per-point kernels via lax.scan.

The Pallas kernels cap their per-call point count (`_MAX_CHUNK` in each
ops module — Mosaic chokes on very large shapes). Chunking used to be a
Python loop, which inlines k copies of the (large) kernel program into
the jaxpr: a 3.6M-point fwd+bwd took ~35 minutes of XLA compile. A
`lax.scan` over chunks compiles the body ONCE — same runtime (chunks are
half-million points; loop overhead is noise), order-of-magnitude faster
compiles, and the persistent compilation cache entries shrink to match.

Per-point outputs are written into preallocated carry buffers with
`dynamic_update_slice`, NOT returned as scan ys: stacking a
[k, max_chunk, F] ys output made XLA fuse the pallas output copy into a
>16 MB scoped-vmem stack allocation on v5e ("Ran out of memory in memory
space vmem ... should not be possible") — the carry update keeps the
transfer a plain HBM slice write.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["scan_chunks", "loop_chunks"]


def scan_chunks(body: Callable, per_point: Sequence[jax.Array], n0: int,
                max_chunk: int, sum_init: Sequence[jax.Array] = (),
                pad_values: Sequence[float] = ()
                ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
    """Run `body(*chunks)` over ⌈n0/max_chunk⌉ chunks with one compiled body.

    per_point: arrays with leading dim n0; zero-padded to a whole number of
    chunks and split along axis 0. body(*chunk_arrays) must return
    (per_point_outs, summed_outs): per-point outputs (leading dim
    max_chunk) are concatenated across chunks and trimmed back to n0;
    summed outputs (e.g. dL/dtable) are accumulated into `sum_init`.

    Padding rows reach `body` as zeros (or `pad_values[i]` where given —
    e.g. 0.5 to keep padded positions mid-domain) — every kernel here
    already treats padded points harmlessly (their outputs are trimmed,
    and zero upstream cotangents contribute nothing to sums).
    """
    k = (n0 + max_chunk - 1) // max_chunk
    pad = k * max_chunk - n0
    pv = tuple(pad_values) + (0.0,) * (len(per_point) - len(pad_values))
    xs = tuple(
        jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                constant_values=v)
        .reshape((k, max_chunk) + a.shape[1:])
        for a, v in zip(per_point, pv))

    chunk_shapes = [jax.ShapeDtypeStruct((max_chunk,) + a.shape[1:],
                                         a.dtype) for a in per_point]
    pp_shapes, _ = jax.eval_shape(body, *chunk_shapes)
    out_init = tuple(jnp.zeros((k * max_chunk,) + s.shape[1:], s.dtype)
                     for s in pp_shapes)

    def step(carry, xt):
        i, chunk = xt
        sums, outs = carry
        pp, sm = body(*chunk)
        sums = tuple(c + s for c, s in zip(sums, sm))
        outs = tuple(
            jax.lax.dynamic_update_slice_in_dim(o, p, i * max_chunk, 0)
            for o, p in zip(outs, pp))
        return (sums, outs), None

    (sums, outs), _ = jax.lax.scan(
        step, (tuple(sum_init), out_init),
        (jnp.arange(k, dtype=jnp.int32), xs))
    return tuple(o[:n0] for o in outs), sums


def loop_chunks(body: Callable, per_point: Sequence[jax.Array], n0: int,
                max_chunk: int, sum_init: Sequence[jax.Array] = (),
                pad_values: Sequence[float] = ()
                ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
    """`scan_chunks` semantics with an UNROLLED Python loop.

    Measured trade (v5e, 3.6M pts, 7 chunks): the inlined form lets XLA
    overlap chunk i+1's prologue with chunk i's kernel — ~14% faster than
    the scan (fwd 0.0633 vs 0.0543 GS/s) — but the program is k× larger,
    so compiles are minutes instead of seconds. FORWARD paths (one kernel
    per chunk, ~5 min cold compile) use this; backward/2nd-order paths
    (whose inlined autodiff graphs took ~35 min to compile) use
    `scan_chunks`.
    """
    k = (n0 + max_chunk - 1) // max_chunk
    pad = k * max_chunk - n0
    pv = tuple(pad_values) + (0.0,) * (len(per_point) - len(pad_values))
    padded = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                      constant_values=v)
              for a, v in zip(per_point, pv)]
    sums = tuple(sum_init)
    outs_parts = None
    for i in range(k):
        chunk = [a[i * max_chunk:(i + 1) * max_chunk] for a in padded]
        pp, sm = body(*chunk)
        sums = tuple(c + s for c, s in zip(sums, sm))
        if outs_parts is None:
            outs_parts = [[p] for p in pp]
        else:
            for parts, p in zip(outs_parts, pp):
                parts.append(p)
    outs = tuple(jnp.concatenate(parts, axis=0)[:n0]
                 for parts in (outs_parts or []))
    return outs, sums
