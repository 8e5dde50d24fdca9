"""Point-cloud IO helpers (reference: nr3d_lib/graphics/pointcloud.py)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["save_ply", "load_ply", "export_pcl_with_colors"]


def save_ply(path: str, pts: np.ndarray, colors: Optional[np.ndarray] = None):
    """ASCII PLY writer."""
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        if colors is not None:
            c = np.asarray(colors)
            if c.dtype != np.uint8:
                c = (np.clip(c, 0, 1) * 255).astype(np.uint8)
            for p, cc in zip(pts, c):
                f.write(f"{p[0]} {p[1]} {p[2]} {cc[0]} {cc[1]} {cc[2]}\n")
        else:
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")


def load_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Minimal ASCII PLY reader (xyz + optional rgb)."""
    with open(path) as f:
        line = f.readline().strip()
        assert line == "ply"
        n = 0
        has_color = False
        while True:
            line = f.readline().strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line.startswith("property uchar red"):
                has_color = True
            if line == "end_header":
                break
        data = np.loadtxt(f, max_rows=n)
    pts = data[:, :3].astype(np.float32)
    colors = data[:, 3:6].astype(np.uint8) if has_color and data.shape[1] >= 6 else None
    return pts, colors


def export_pcl_with_colors(path: str, pts, colors=None):
    save_ply(path, np.asarray(pts), None if colors is None else np.asarray(colors))
