"""Occupancy-grid ray marching (functional core).

TPU-native re-design of the reference's nerfacc-derived CUDA marcher
(reference: csrc/occ_grid/src/{ray_marching.cu:17-100,batched_marching.cu,
forest_marching.cu}; API csrc/occ_grid/src/occ_grid.cpp:23-32). The CUDA
version walks a DDA per ray in two rounds (count, then fill) producing
ragged packed samples with `dt_gamma` geometric step growth.

TPU version: the step sequence is *closed-form* (geometric-growth steps are
a cumsum of a static-length dt vector), so candidate samples form a dense
[R, S_max] grid computed entirely vectorized; occupancy lookup masks out
candidates in empty voxels. Masked results either stay dense (for fixed-count
pipelines) or are compacted into packed buffers (for the ragged pipeline) —
compaction replaces the CUDA two-round count/fill scheme.

Marching happens in the normalized [-1,1]^3 space of the grid.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["march_steps", "occgrid_query", "occgrid_march_dense",
           "occgrid_march_batched_dense"]

Array = jax.Array


def march_steps(near: Array, far: Array, n_steps: int, step_size: float,
                dt_gamma: float = 0.0, max_step_size: Optional[float] = None,
                perturb_key: Optional[Array] = None
                ) -> Tuple[Array, Array, Array]:
    """Closed-form step sequence per ray.

    Returns (t_start [R,S], dt [R,S], in_range [R,S]) with
    dt_i = clip(step_size·(1+γ)^i, ·, max_step_size), t cumulative from near
    (reference: ray_marching.cu calc_dt / dt_gamma semantics).
    """
    r = near.shape[0]
    i = jnp.arange(n_steps, dtype=near.dtype)
    if dt_gamma > 0.0:
        dt = step_size * jnp.power(1.0 + dt_gamma, i)
        if max_step_size is not None:
            dt = jnp.minimum(dt, max_step_size)
    else:
        dt = jnp.full((n_steps,), step_size, near.dtype)
    t_end = jnp.cumsum(dt)
    t_start = (t_end - dt)[None, :] + near[:, None]          # [R,S]
    dt = jnp.broadcast_to(dt[None, :], (r, n_steps))
    if perturb_key is not None:
        u = jax.random.uniform(perturb_key, (r, n_steps), near.dtype)
    else:
        u = 0.5
    t_jitter = t_start + u * dt
    in_range = (t_jitter < far[:, None]) & (t_start >= near[:, None] - 1e-9)
    return t_jitter, dt, in_range


def occgrid_query(occ: Array, x: Array) -> Array:
    """Query a binary occupancy grid at normalized positions x ∈ [-1,1]^D.

    occ: [r0, r1, r2] bool. Out-of-range queries return False.

    Lowering note (v5e, 786k queries): 3-vector advanced indexing 9.9 ms →
    single-axis flat take 6.2 ms → Pallas row-gather (TPU only) ~1 ms.
    """
    res = jnp.asarray(occ.shape, x.dtype)
    u = (x + 1.0) * 0.5  # [0,1]
    idx = jnp.floor(u * res).astype(jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < jnp.asarray(occ.shape)), axis=-1)
    idx = jnp.clip(idx, 0, jnp.asarray(occ.shape) - 1)
    if jax.default_backend() == "tpu" and occ.ndim == 3 \
            and occ.shape[2] <= 128 and idx.ndim == 2:
        from nr3d_lib_tpu.ops.gather1d import gather_rows_lanes

        row = idx[..., 0] * occ.shape[1] + idx[..., 1]
        vals = gather_rows_lanes(
            occ.reshape(occ.shape[0] * occ.shape[1],
                        occ.shape[2]).astype(jnp.float32),
            row, idx[..., 2]) > 0.5
    else:
        flat = (idx[..., 0] * occ.shape[1] + idx[..., 1]) * occ.shape[2] \
            + idx[..., 2]
        vals = jnp.take(occ.reshape(-1), flat, mode="clip")
    return vals & inb


def occgrid_march_dense(occ: Array, rays_o: Array, rays_d: Array,
                        near: Array, far: Array, *,
                        n_steps: int, step_size: float,
                        dt_gamma: float = 0.0,
                        max_step_size: Optional[float] = None,
                        perturb_key: Optional[Array] = None
                        ) -> Tuple[Array, Array, Array]:
    """March rays through an occupancy grid → dense [R, S] samples + mask.

    Rays must already be in the grid's normalized [-1,1]^3 space
    (use `AABBSpace.normalize_rays`). Returns (t [R,S], dt [R,S], mask [R,S])
    where mask = in-range ∧ voxel-occupied — the dense equivalent of the
    reference's packed (t_starts, t_ends, ridx) triple.
    """
    t, dt, in_range = march_steps(near, far, n_steps, step_size, dt_gamma,
                                  max_step_size, perturb_key)
    x = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]   # [R,S,3]
    occ_hit = occgrid_query(occ, x)
    return t, dt, in_range & occ_hit


def occgrid_march_batched_dense(occ: Array, bidx: Array,
                                rays_o: Array, rays_d: Array,
                                near: Array, far: Array, *,
                                n_steps: int, step_size: float,
                                dt_gamma: float = 0.0,
                                max_step_size: Optional[float] = None,
                                perturb_key: Optional[Array] = None
                                ) -> Tuple[Array, Array, Array]:
    """Batched variant: occ [B, r, r, r], bidx [R] selects each ray's grid
    (reference: batched_ray_marching, csrc/occ_grid/src/batched_marching.cu:18)."""
    t, dt, in_range = march_steps(near, far, n_steps, step_size, dt_gamma,
                                  max_step_size, perturb_key)
    x = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    res = jnp.asarray(occ.shape[1:], x.dtype)
    u = (x + 1.0) * 0.5
    idx = jnp.floor(u * res).astype(jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < jnp.asarray(occ.shape[1:])), axis=-1)
    idx = jnp.clip(idx, 0, jnp.asarray(occ.shape[1:]) - 1)
    b = jnp.maximum(bidx, 0)[:, None]
    vals = occ[b, idx[..., 0], idx[..., 1], idx[..., 2]]
    occ_hit = vals & inb & (bidx >= 0)[:, None]
    return t, dt, in_range & occ_hit
