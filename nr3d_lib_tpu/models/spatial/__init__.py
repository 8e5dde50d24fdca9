"""Spaces: coordinate normalization + ray tests (reference: nr3d_lib/models/spatial/)."""

from nr3d_lib_tpu.models.spatial.aabb import AABBSpace, AABBDynamicSpace  # noqa: F401
from nr3d_lib_tpu.models.spatial.batched import BatchedBlockSpace, BatchedDynamicSpace  # noqa: F401
