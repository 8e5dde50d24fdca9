"""Triangle-mesh IO + marching-cubes extraction.

Reference: nr3d_lib/graphics/trianglemesh.py:134 (`extract_mesh`). Marching
cubes runs on host numpy over an SDF grid evaluated in chunks on device.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

__all__ = ["save_obj", "load_obj", "extract_mesh", "marching_cubes"]


def save_obj(path: str, vertices, faces):
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces + 1:  # obj is 1-indexed
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:4]]
                faces.append(idx)
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def marching_cubes(volume: np.ndarray, level: float = 0.0,
                   spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0)):
    """Isosurface of a dense scalar grid → (verts, faces).

    Priority: native C++ marching tetrahedra (csrc/mcubes, built on first
    use) → skimage marching cubes → pure-numpy surface-nets fallback.
    """
    from nr3d_lib_tpu.bindings import marching_tets_native

    out = marching_tets_native(volume, level)
    if out is not None:
        verts, faces = out
        return verts * np.asarray(spacing, np.float32), faces
    try:
        from skimage import measure

        verts, faces, _, _ = measure.marching_cubes(volume, level=level, spacing=spacing)
        return verts.astype(np.float32), faces.astype(np.int32)
    except ImportError:
        return _surface_nets(volume, level, spacing)


def _surface_nets(volume: np.ndarray, level: float, spacing) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal naive surface-nets: one vertex per sign-change cell, quads split
    into triangles. Lower quality than marching cubes but dependency-free."""
    vol = np.asarray(volume, np.float32) - level
    nx, ny, nz = vol.shape
    inside = vol < 0
    # cell has a crossing if its 8 corners are not all same sign
    c = inside
    cell = np.zeros((nx - 1, ny - 1, nz - 1), dtype=np.int32)
    acc = np.zeros((nx - 1, ny - 1, nz - 1), dtype=np.int32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                acc += c[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
    crossing = (acc > 0) & (acc < 8)
    idx = np.full(crossing.shape, -1, dtype=np.int64)
    xs, ys, zs = np.nonzero(crossing)
    idx[xs, ys, zs] = np.arange(len(xs))
    verts = (np.stack([xs, ys, zs], -1).astype(np.float32) + 0.5) * np.asarray(spacing, np.float32)

    faces = []
    # for each edge crossing between adjacent cells along each axis, emit a quad
    def quad(a, b, cc, d):
        faces.append([a, b, cc])
        faces.append([a, cc, d])

    for axis in range(3):
        # edges along `axis` at corner (x+1,y+1,z+1)-ish: connect 4 cells around the edge
        e0 = inside[1:-1, 1:-1, 1:-1]
        shift = [0, 0, 0]
        shift[axis] = 1
        e1 = inside[1 + shift[0]:nx - 1 + shift[0],
                    1 + shift[1]:ny - 1 + shift[1],
                    1 + shift[2]:nz - 1 + shift[2]]
        cross = e0 != e1
        ax, ay, az = np.nonzero(cross)
        o1, o2 = [(1, 2), (0, 2), (0, 1)][axis]
        for x, y, z in zip(ax, ay, az):
            cells = []
            base = [x, y, z]
            for da in (0, 1):
                for db in (0, 1):
                    cpos = list(base)
                    cpos[o1] -= da
                    cpos[o2] -= db
                    cells.append(idx[tuple(cpos)])
            if all(ci >= 0 for ci in cells):
                a, b, cc, d = cells[0], cells[1], cells[3], cells[2]
                if e0[x, y, z]:
                    quad(a, b, cc, d)
                else:
                    quad(d, cc, b, a)
    faces = np.asarray(faces, np.int32) if faces else np.zeros((0, 3), np.int32)
    return verts, faces


def extract_mesh(query_sdf: Callable, resolution: int = 256, level: float = 0.0,
                 aabb_min=(-1.0, -1.0, -1.0), aabb_max=(1.0, 1.0, 1.0),
                 chunk: int = 2 ** 16, filepath: Optional[str] = None):
    """Evaluate an SDF on a dense grid (chunked, on device) and mesh it.

    Reference: nr3d_lib/graphics/trianglemesh.py:134.
    query_sdf: fn [N,3] → [N] (jax arrays ok).
    """
    aabb_min = np.asarray(aabb_min, np.float32)
    aabb_max = np.asarray(aabb_max, np.float32)
    lin = [np.linspace(aabb_min[i], aabb_max[i], resolution, dtype=np.float32) for i in range(3)]
    grid = np.stack(np.meshgrid(*lin, indexing="ij"), axis=-1).reshape(-1, 3)
    sdf = np.empty(grid.shape[0], np.float32)
    for start in range(0, grid.shape[0], chunk):
        stop = min(start + chunk, grid.shape[0])
        sdf[start:stop] = np.asarray(query_sdf(grid[start:stop])).reshape(-1)
    volume = sdf.reshape(resolution, resolution, resolution)
    spacing = (aabb_max - aabb_min) / (resolution - 1)
    verts, faces = marching_cubes(volume, level=level, spacing=tuple(spacing))
    verts = verts + aabb_min
    if filepath is not None:
        save_obj(filepath, verts, faces)
    return verts, faces
