from .ransac import (
    RansacResult,
    absolute_pose_ransac,
    rotation_only_ransac,
)
from .triangulation import (
    TriangulationResult,
    point_from_homogeneous,
    triangulate_fast,
)

__all__ = [
    "RansacResult",
    "TriangulationResult",
    "absolute_pose_ransac",
    "point_from_homogeneous",
    "rotation_only_ransac",
    "triangulate_fast",
]
