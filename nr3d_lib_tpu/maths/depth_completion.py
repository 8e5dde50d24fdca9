"""IP-Basic-style sparse depth completion.

Reference: nr3d_lib/maths/depth_completion_np.py:305 / _pytorch.py:144 —
classic morphology pipeline (dilate → close → fill) completing sparse LiDAR
depth maps. Implemented on numpy (host-side preprocessing, like the
reference's primary numpy path).
"""

from __future__ import annotations

import numpy as np

__all__ = ["depth_completion"]


def _dilate(d: np.ndarray, k: int) -> np.ndarray:
    """Max-filter over a k×k window treating 0 as empty."""
    h, w = d.shape
    pad = k // 2
    padded = np.pad(d, pad, mode="constant")
    out = d.copy()
    stack = np.stack([padded[i:i + h, j:j + w]
                      for i in range(k) for j in range(k)])
    return stack.max(0)


def _min_nonzero(d: np.ndarray, k: int) -> np.ndarray:
    h, w = d.shape
    pad = k // 2
    padded = np.pad(d, pad, mode="constant", constant_values=np.inf)
    padded[padded == 0] = np.inf
    stack = np.stack([padded[i:i + h, j:j + w]
                      for i in range(k) for j in range(k)])
    out = stack.min(0)
    out[~np.isfinite(out)] = 0.0
    return out


def depth_completion(depth: np.ndarray, max_depth: float = 100.0,
                     kernel: int = 5, fill_remaining: bool = True
                     ) -> np.ndarray:
    """Sparse (0 = missing) depth [H,W] → dense depth.

    Pipeline (IP-Basic): invert → nearest-dilate (prefers close surfaces) →
    morphological close → large-hole fill → invert back.
    """
    d = np.asarray(depth, np.float32).copy()
    valid = d > 0.1
    # invert so dilation prefers CLOSER (larger inverted) depths
    inv = np.where(valid, max_depth - d, 0.0)
    inv = _dilate(inv, kernel)
    # close small holes: dilate then (non-zero) erode
    closed = _dilate(inv, kernel)
    closed = _min_nonzero(closed, kernel)
    inv = np.where(inv > 0, inv, closed)
    if fill_remaining:
        big = _dilate(inv, kernel * 3 + 1)
        inv = np.where(inv > 0, inv, big)
        # anything still empty → farthest plane
        inv = np.where(inv > 0, inv, 1e-3)
    out = np.where(inv > 0, max_depth - inv, 0.0)
    return np.clip(out, 0.0, max_depth)
