"""Camera model tests — mirrors ``okvis_cv/test/TestPinholeCamera.cpp``:
project/backProject round trips across random points for every distortion
model, Jacobian checks vs AD, out-of-image invalidation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svin_tpu.cameras import (
    NCameraSystem,
    back_project,
    make_camera,
    project,
    project_homogeneous,
    project_jacobian,
)
from svin_tpu.kinematics import from_rq


def _cameras():
    return {
        "none": make_camera(752, 480, 458.0, 457.0, 367.0, 248.0, model="none"),
        "radialtangential": make_camera(
            752, 480, 458.654, 457.296, 367.215, 248.375,
            dist_params=[-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05],
            model="radialtangential",
        ),
        "equidistant": make_camera(
            752, 480, 460.0, 460.0, 376.0, 240.0,
            dist_params=[-0.0027, 0.0241, -0.0430, 0.0311],
            model="equidistant",
        ),
        "radialtangential8": make_camera(
            752, 480, 458.654, 457.296, 367.215, 248.375,
            dist_params=[-0.28, 0.07, 0.0002, 1.8e-05, 0.0, 0.01, 0.001, 0.0001],
            model="radialtangential8",
        ),
    }


@pytest.mark.parametrize("model", ["none", "radialtangential", "equidistant", "radialtangential8"])
def test_project_backproject_roundtrip(model):
    cam = _cameras()[model]
    key = jax.random.PRNGKey(42)
    # sample pixels well inside the image, lift to rays, re-project
    uv = jax.random.uniform(
        key, (200, 2),
        minval=jnp.array([100.0, 100.0]), maxval=jnp.array([650.0, 380.0]),
    )
    rays = back_project(cam, uv)
    depths = jnp.linspace(0.5, 10.0, 200)[:, None]
    uv2, valid = project(cam, rays * depths)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(uv2, uv, atol=1e-3)


def test_project_behind_camera_invalid():
    cam = _cameras()["radialtangential"]
    p = jnp.array([[0.1, 0.1, -1.0], [0.0, 0.0, 1.0]])
    _, valid = project(cam, p)
    assert not bool(valid[0]) and bool(valid[1])


def test_project_homogeneous_sign():
    cam = _cameras()["radialtangential"]
    hp = jnp.array([0.2, -0.1, 2.0, 1.0])
    uv1, v1 = project_homogeneous(cam, hp)
    uv2, v2 = project_homogeneous(cam, -hp)  # same projective point
    assert bool(v1) and bool(v2)
    np.testing.assert_allclose(uv1, uv2, atol=1e-6)


@pytest.mark.parametrize("model", ["none", "radialtangential", "equidistant", "radialtangential8"])
def test_project_jacobian_vs_ad(model):
    cam = _cameras()[model]
    pts = jnp.array([[0.3, -0.2, 2.0], [0.0, 0.0, 1.0], [-0.5, 0.4, 5.0]])
    J = project_jacobian(cam, pts)
    J_ad = jax.vmap(jax.jacfwd(lambda p: project(cam, p)[0]))(pts)
    np.testing.assert_allclose(J, J_ad, rtol=1e-5, atol=1e-5)


def test_ncamera_overlap():
    cams = _cameras()
    rig = NCameraSystem()
    # stereo pair, 11 cm baseline → overlap; opposite-facing camera → none
    rig.add_camera(from_rq([0.0, 0.0, 0.0], [0, 0, 0, 1]), cams["radialtangential"])
    rig.add_camera(from_rq([0.11, 0.0, 0.0], [0, 0, 0, 1]), cams["radialtangential"])
    rig.add_camera(from_rq([0.0, 0.0, 0.0], [1, 0, 0, 0]), cams["none"])  # 180° about x
    assert rig.has_overlap(0, 1)
    assert rig.has_overlap(1, 0)
    assert not rig.has_overlap(0, 2)
