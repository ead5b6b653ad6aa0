from .ransac import (
    RansacResult,
    absolute_pose_ransac,
    absolute_pose_ransac_p3p,
    relative_pose_ransac,
    rotation_only_ransac,
)
from .scale_refinement import ScaleEstimate, ScaleRefiner, solve_scale
from .triangulation import (
    TriangulationResult,
    point_from_homogeneous,
    triangulate_fast,
    triangulation_covariance,
)

__all__ = [
    "RansacResult",
    "ScaleEstimate",
    "ScaleRefiner",
    "TriangulationResult",
    "absolute_pose_ransac",
    "absolute_pose_ransac_p3p",
    "relative_pose_ransac",
    "point_from_homogeneous",
    "rotation_only_ransac",
    "solve_scale",
    "triangulate_fast",
    "triangulation_covariance",
]
