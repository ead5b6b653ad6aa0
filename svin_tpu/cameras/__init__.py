from . import distortion
from .ncamera import NCameraSystem
from .pinhole import (
    PinholeCamera,
    back_project,
    make_camera,
    project,
    project_homogeneous,
    project_jacobian,
)

__all__ = [
    "distortion",
    "NCameraSystem",
    "PinholeCamera",
    "back_project",
    "make_camera",
    "project",
    "project_homogeneous",
    "project_jacobian",
]
