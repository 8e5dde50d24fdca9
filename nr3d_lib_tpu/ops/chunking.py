"""Chunked execution of per-point kernels via lax.scan.

The Pallas kernels cap their per-call point count (`_MAX_CHUNK` in each
ops module — Mosaic chokes on very large shapes). Chunking used to be a
Python loop, which inlines k copies of the (large) kernel program into
the jaxpr: a 3.6M-point fwd+bwd took ~35 minutes of XLA compile. A
`lax.scan` over chunks compiles the body ONCE — same runtime (chunks are
half-million points; loop overhead is noise), order-of-magnitude faster
compiles, and the persistent compilation cache entries shrink to match.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["scan_chunks"]


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

    def step(carry, chunk):
        pp, sm = body(*chunk)
        return tuple(c + s for c, s in zip(carry, sm)), pp

    sums, stacked = jax.lax.scan(step, tuple(sum_init), xs)
    outs = tuple(s.reshape((k * max_chunk,) + s.shape[2:])[:n0]
                 for s in stacked)
    return outs, sums
