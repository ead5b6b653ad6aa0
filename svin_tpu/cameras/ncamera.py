"""Multi-camera rig: per-camera extrinsics T_SC + geometry.

Re-design of ``okvis::cameras::NCameraSystem``
(reference: ``okvis_cv/include/okvis/cameras/NCameraSystem.hpp``). The rig is
a static Python-level container (camera count and models are trace-static);
extrinsics are Transformation pytrees so they can be optimized online.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax.numpy as jnp

from ..kinematics import Transformation, compose, inverse, transform_point
from .pinhole import PinholeCamera, back_project, project


@dataclass
class NCameraSystem:
    cameras: List[PinholeCamera] = field(default_factory=list)
    T_SC: List[Transformation] = field(default_factory=list)

    @property
    def num_cameras(self) -> int:
        return len(self.cameras)

    def add_camera(self, T_SC: Transformation, camera: PinholeCamera) -> None:
        self.cameras.append(camera)
        self.T_SC.append(T_SC)

    def T_CiCj(self, i: int, j: int) -> Transformation:
        """Relative transform camera j → camera i."""
        return compose(inverse(self.T_SC[i]), self.T_SC[j])

    def has_overlap(self, i: int, j: int, depth: float = 2.0, grid: int = 8) -> bool:
        """Approximate FOV-overlap check: back-project a grid of pixels from
        camera j at the given depth and test visibility in camera i (replaces
        the reference's per-pixel overlap mask computation with a coarse,
        host-side heuristic — used only for match-pair selection).
        """
        if i == j:
            return True
        camj, cami = self.cameras[j], self.cameras[i]
        us = jnp.linspace(0, camj.width - 1, grid)
        vs = jnp.linspace(0, camj.height - 1, grid)
        uu, vv = jnp.meshgrid(us, vs)
        uv = jnp.stack([uu.ravel(), vv.ravel()], axis=-1)
        rays = back_project(camj, uv) * depth
        T_CiCj = self.T_CiCj(i, j)
        p_Ci = transform_point(T_CiCj, rays)
        _, valid = project(cami, p_Ci)
        return bool(jnp.any(valid))
