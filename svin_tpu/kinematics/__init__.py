from . import npq, quaternion
from .transformation import (
    Transformation,
    compose,
    from_matrix,
    from_rq,
    identity,
    inverse,
    lift_jacobian,
    ominus,
    oplus,
    oplus_jacobian,
    transform_homogeneous,
    transform_point,
)

__all__ = [
    "quaternion",
    "Transformation",
    "compose",
    "from_matrix",
    "from_rq",
    "identity",
    "inverse",
    "lift_jacobian",
    "ominus",
    "oplus",
    "oplus_jacobian",
    "transform_homogeneous",
    "transform_point",
]
