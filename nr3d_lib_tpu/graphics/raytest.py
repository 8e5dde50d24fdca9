"""Ray–primitive intersection tests (reference: nr3d_lib/graphics/raytest.py:23-199)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["ray_sphere_intersection", "ray_box_intersection", "ray_box_intersection_fast"]

Array = jax.Array


def ray_sphere_intersection(rays_o: Array, rays_d: Array, radius: float = 1.0,
                            center=None) -> Tuple[Array, Array, Array]:
    """Ray–sphere: returns (near, far, hit). Rays with no hit get near=far=0.

    Reference: raytest.py ray_sphere intersection.
    """
    o = rays_o if center is None else rays_o - center
    b = jnp.sum(o * rays_d, -1)
    c = jnp.sum(o * o, -1) - radius * radius
    a = jnp.sum(rays_d * rays_d, -1)
    disc = b * b - a * c
    hit = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    near = (-b - sq) / a
    far = (-b + sq) / a
    hit = hit & (far > 0)
    near = jnp.where(hit, jnp.maximum(near, 0.0), 0.0)
    far = jnp.where(hit, far, 0.0)
    return near, far, hit


def ray_box_intersection(rays_o: Array, rays_d: Array,
                         aabb_min=-1.0, aabb_max=1.0,
                         t_min: float = 0.0, t_max: float = 1e10
                         ) -> Tuple[Array, Array, Array]:
    """Slab-method ray–AABB: (t_near, t_far, hit) (reference: raytest.py:23)."""
    aabb_min = jnp.asarray(aabb_min, rays_o.dtype)
    aabb_max = jnp.asarray(aabb_max, rays_o.dtype)
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12,
                            jnp.where(rays_d >= 0, 1e-12, -1e-12), rays_d)
    t0 = (aabb_min - rays_o) * inv_d
    t1 = (aabb_max - rays_o) * inv_d
    t_small = jnp.minimum(t0, t1)
    t_big = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(t_small, -1), t_min)
    far = jnp.minimum(jnp.min(t_big, -1), t_max)
    hit = near < far
    return jnp.where(hit, near, 0.0), jnp.where(hit, far, 0.0), hit


# alias: the reference has float/tensor "fast" variants; XLA fuses them anyway
ray_box_intersection_fast = ray_box_intersection
