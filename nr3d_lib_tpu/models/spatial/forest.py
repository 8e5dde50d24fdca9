"""Forest block space: large-scale scenes as a grid of occupied blocks.

TPU-native re-design of the reference's kaolin-SPC-octree forest
(reference: nr3d_lib/models/spatial/forest.py:162-396 ForestBlockSpace +
csrc/forest N6 ForestMeta). The reference stores occupied blocks in an
octree and raytraces it with kaolin SPC; here the block set is a dense
coarse boolean grid — at practical forest sizes (≤128³ blocks) a dense grid
is smaller than the octree's pointers, ray testing reuses the DDA-free
occupancy marcher, and everything stays static-shape / XLA-friendly.

Blocks are cubes of side `block_size` anchored at `origin`; occupied blocks
get dense slots [0, n_trees) via `block_idx` (−1 = empty). Per-block LoTD
parameters use the slot as the batched-encode `bidx`
(SURVEY.md §3.5 translation).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from nr3d_lib_tpu.graphics.raytest import ray_box_intersection

__all__ = ["ForestBlockSpace"]

Array = jax.Array


class ForestBlockSpace(nnx.Module):
    def __init__(self, *, level: int = 4, origin=(-1.0, -1.0, -1.0),
                 block_size: float = 0.5, resolution: Optional[Sequence[int]] = None,
                 dtype=jnp.float32):
        """resolution: blocks per axis (default 2^level as in the reference's
        octree level)."""
        if resolution is None:
            resolution = (2 ** level,) * 3
        self.resolution = tuple(int(r) for r in resolution)
        self.level = level
        self.origin = nnx.Variable(jnp.asarray(origin, dtype))
        self.block_size = float(block_size)
        self.occupied = nnx.Variable(jnp.zeros(self.resolution, bool))
        # dense slot per occupied block; -1 for empty (rebuilt on populate)
        self.block_idx = nnx.Variable(-jnp.ones(self.resolution, jnp.int32))
        self.n_trees = 0

    # ------------------------------------------------------------ populate
    def _rebuild_slots(self):
        occ = np.asarray(self.occupied[...])
        idx = -np.ones(self.resolution, np.int32)
        coords = np.argwhere(occ)
        idx[tuple(coords.T)] = np.arange(len(coords), dtype=np.int32)
        self.block_idx[...] = jnp.asarray(idx)
        self.n_trees = int(len(coords))
        self._block_coords = jnp.asarray(coords, jnp.int32)  # [n_trees, 3]

    def populate_from_corners(self, corners):
        """corners: [N,3] integer block coords (reference
        populate_from_corners forest.py:162)."""
        occ = np.zeros(self.resolution, bool)
        c = np.asarray(corners, np.int64)
        occ[c[:, 0], c[:, 1], c[:, 2]] = True
        self.occupied[...] = jnp.asarray(occ)
        self._rebuild_slots()

    def populate_from_points(self, pts, dilate: int = 0):
        """Mark blocks containing any of `pts` (reference
        populate_from_mesh/waypoints are point-set driven)."""
        pts = np.asarray(pts)
        b = np.floor((pts - np.asarray(self.origin[...])) / self.block_size)
        b = b.astype(np.int64)
        res = np.asarray(self.resolution)
        keep = ((b >= 0) & (b < res)).all(-1)
        b = b[keep]
        occ = np.zeros(self.resolution, bool)
        occ[b[:, 0], b[:, 1], b[:, 2]] = True
        if dilate > 0:
            from scipy import ndimage  # optional; fall back to manual

            occ = ndimage.binary_dilation(occ, iterations=dilate)
        self.occupied[...] = jnp.asarray(occ)
        self._rebuild_slots()

    def populate_from_waypoints(self, waypoints, extend_units: int = 1):
        """Occupy blocks along a trajectory + neighbors (reference
        populate_from_waypoints forest.py:206)."""
        pts = np.asarray(waypoints)
        offs = np.arange(-extend_units, extend_units + 1)
        grid = np.stack(np.meshgrid(offs, offs, offs, indexing="ij"), -1
                        ).reshape(-1, 3) * self.block_size
        all_pts = (pts[:, None, :] + grid[None]).reshape(-1, 3)
        self.populate_from_points(all_pts)

    # ------------------------------------------------------------- mapping
    @property
    def block_coords(self) -> Array:
        """[n_trees, 3] integer coords of occupied blocks."""
        return self._block_coords

    def block_aabb(self) -> Array:
        """World AABB of the whole forest [2,3]."""
        o = self.origin[...]
        return jnp.stack([o, o + jnp.asarray(self.resolution, o.dtype)
                          * self.block_size])

    def block_of_points(self, x: Array) -> Array:
        """World points → block slot (−1 outside/empty)."""
        b = jnp.floor((x - self.origin[...]) / self.block_size).astype(jnp.int32)
        res = jnp.asarray(self.resolution)
        inb = jnp.all((b >= 0) & (b < res), axis=-1)
        b = jnp.clip(b, 0, res - 1)
        slot = self.block_idx[...][b[..., 0], b[..., 1], b[..., 2]]
        return jnp.where(inb, slot, -1)

    def normalize_coords(self, x: Array, bidx: Array) -> Array:
        """World → block-local [-1,1] for each point's block slot."""
        corners = self._block_coords[jnp.maximum(bidx, 0)]
        lo = self.origin[...] + corners.astype(x.dtype) * self.block_size
        return (x - lo) / self.block_size * 2.0 - 1.0

    # ------------------------------------------------------------- ray test
    def ray_test(self, rays_o: Array, rays_d: Array,
                 near: Optional[float] = None, far: Optional[float] = None
                 ) -> Dict[str, Array]:
        """Slab test against the forest bounds (per-block segments come from
        marching the block grid — `ray_march_blocks`)."""
        aabb = self.block_aabb()
        t_near, t_far, hit = ray_box_intersection(
            rays_o, rays_d, aabb[0], aabb[1], t_min=near or 0.0,
            t_max=far or 1e10)
        return {"near": t_near, "far": t_far, "mask": hit,
                "rays_o": rays_o, "rays_d": rays_d,
                "num_rays": rays_o.shape[0]}

    def ray_march_blocks(self, rays_o: Array, rays_d: Array, near: Array,
                         far: Array, *, n_steps: int, step_size: float,
                         perturb_key=None) -> Tuple[Array, Array, Array, Array]:
        """March world rays; per candidate sample return its block slot.

        → (t [R,S], dt [R,S], bidx [R,S] (−1 empty), mask [R,S]).
        Replaces the reference's SPC raytrace + forest_ray_marching
        (SURVEY.md §3.5): empty-block samples are masked, per-segment pack
        bookkeeping is unnecessary because samples stay globally t-sorted.
        """
        from nr3d_lib_tpu.ops.occgrid_march import march_steps

        t, dt, in_range = march_steps(near, far, n_steps, step_size,
                                      perturb_key=perturb_key)
        x = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
        bidx = self.block_of_points(x)
        mask = in_range & (bidx >= 0)
        return t, dt, bidx, mask

    def state_dict(self):
        return {"occupied": self.occupied[...], "origin": self.origin[...],
                "block_idx": self.block_idx[...]}

    def load_state_dict(self, sd):
        self.occupied[...] = jnp.asarray(sd["occupied"])
        self.origin[...] = jnp.asarray(sd["origin"])
        self.block_idx[...] = jnp.asarray(sd["block_idx"])
        self._rebuild_slots()
