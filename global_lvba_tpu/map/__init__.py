from .moments import transform_moments, cov_from_moments, merge_moments
from .voxelize import build_voxel_map, VoxelMap, PlaneFactorBucket, PlaneLookup

__all__ = [
    "transform_moments",
    "cov_from_moments",
    "merge_moments",
    "build_voxel_map",
    "VoxelMap",
    "PlaneFactorBucket",
    "PlaneLookup",
]
