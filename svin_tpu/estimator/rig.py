"""Device-side camera-rig parameters: stacked per-camera arrays.

The NCameraSystem is host-side (Python lists); the estimator needs dynamic
per-observation camera indexing, so intrinsics/extrinsics are stacked into
arrays. All cameras in a rig must share one distortion model (true of every
reference config; mixed-model rigs would need per-model observation
partitions).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..cameras import NCameraSystem, PinholeCamera
from ..kinematics import Transformation


class RigParams(NamedTuple):
    T_SC_r: jnp.ndarray  # (NC,3)
    T_SC_q: jnp.ndarray  # (NC,4)
    fu: jnp.ndarray  # (NC,)
    fv: jnp.ndarray
    cu: jnp.ndarray
    cv: jnp.ndarray
    dist: jnp.ndarray  # (NC,P)
    width: int
    height: int
    model: str

    @property
    def num_cameras(self) -> int:
        return self.T_SC_r.shape[0]

    def camera(self, c) -> PinholeCamera:
        """Camera with dynamically-indexed intrinsics (c may be traced)."""
        return PinholeCamera(
            fu=self.fu[c], fv=self.fv[c], cu=self.cu[c], cv=self.cv[c],
            dist_params=self.dist[c], width=self.width, height=self.height,
            model=self.model,
        )

    def T_SC(self, c) -> Transformation:
        return Transformation(r=self.T_SC_r[c], q=self.T_SC_q[c])


def rig_params(rig: NCameraSystem, dtype=jnp.float64) -> RigParams:
    models = {c.model for c in rig.cameras}
    if len(models) != 1:
        raise ValueError(f"rig cameras must share a distortion model, got {models}")
    return RigParams(
        T_SC_r=jnp.stack([T.r for T in rig.T_SC]).astype(dtype),
        T_SC_q=jnp.stack([T.q for T in rig.T_SC]).astype(dtype),
        fu=jnp.stack([c.fu for c in rig.cameras]).astype(dtype),
        fv=jnp.stack([c.fv for c in rig.cameras]).astype(dtype),
        cu=jnp.stack([c.cu for c in rig.cameras]).astype(dtype),
        cv=jnp.stack([c.cv for c in rig.cameras]).astype(dtype),
        dist=jnp.stack([c.dist_params for c in rig.cameras]).astype(dtype),
        width=rig.cameras[0].width,
        height=rig.cameras[0].height,
        model=rig.cameras[0].model,
    )
