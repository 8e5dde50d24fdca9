"""Acceleration structures: occupancy grids + ray-march wrappers.

Reference: nr3d_lib/models/accelerations/__init__.py:46-86 (get_accel registry).
"""

from nr3d_lib_tpu.models.accelerations.occgrid import OccGridEma, OccGridGetter  # noqa: F401
from nr3d_lib_tpu.models.accelerations.occgrid_accel import OccGridAccel  # noqa: F401
from nr3d_lib_tpu.models.accelerations.occgrid_batched import (  # noqa: F401
    OccGridAccelBatched, OccGridAccelBatchedDynamic, OccGridAccelDynamic,
    OccGridAccelStaticAndDynamic)
from nr3d_lib_tpu.models.accelerations.occgrid_forest import (  # noqa: F401
    OccGridAccelForest)


def get_accel(type: str = "occ_grid", **kwargs):
    """Acceleration-structure factory (reference: accelerations/__init__.py:80)."""
    t = type.lower()
    if t in ("occ_grid", "occgrid", "occ_grid_ema", "occ_grid_getter"):
        return OccGridAccel(use_ema=("getter" not in t), **kwargs)
    if t in ("occ_grid_batched", "occ_grid_batched_ema"):
        return OccGridAccelBatched(**kwargs)
    if t in ("occ_grid_batched_dynamic",):
        return OccGridAccelBatchedDynamic(**kwargs)
    if t in ("occ_grid_dynamic",):
        return OccGridAccelDynamic(**kwargs)
    if t in ("occ_grid_static_and_dynamic",):
        return OccGridAccelStaticAndDynamic(**kwargs)
    if t in ("occ_grid_forest",):
        return OccGridAccelForest(**kwargs)
    raise ValueError(f"Unknown accel type: {type}")
