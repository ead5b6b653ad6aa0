"""Oriented 256-bit binary descriptor (BRISK/BRIEF-class) + bit packing.

TPU-native replacement for the BRISK descriptor (superbuild BRISK 2.0.8,
used via ``Frame::describe`` with gravity-aligned extraction direction,
``Frontend.cpp:91-113``) and the pose_graph's DVision BRIEF-256
(``pose_graph/ThirdParty/DVision/BRIEF256.h``): a fixed pseudo-random
pairwise-intensity-test pattern, rotated per keypoint by its extraction
angle, sampled bilinearly from a Gaussian-smoothed image, packed into 8
uint32 words. One vmapped gather evaluates all K keypoints in one program.

The pattern is generated deterministically at import (seed 42) — descriptor
semantics (256 smoothed pairwise tests) match the reference family; the
exact pattern differs by design (no data files, no code copied).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .image import gaussian_blur

DESC_BITS = 256
DESC_WORDS = DESC_BITS // 32
PATCH_RADIUS = 16.0


def _make_pattern(seed: int = 42) -> np.ndarray:
    """(256, 2, 2) array of (pointA, pointB) offsets, Gaussian-distributed
    (sigma = radius/5, ORB-style), clipped to the patch."""
    rng = np.random.RandomState(seed)
    pts = rng.randn(DESC_BITS, 2, 2) * (PATCH_RADIUS / 5.0 * 2.0)
    return np.clip(pts, -PATCH_RADIUS + 1, PATCH_RADIUS - 1)


PATTERN = jnp.asarray(_make_pattern(), jnp.float32)  # (256,2,2)
_BIT_WEIGHTS = jnp.asarray(
    (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)
)


def _bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at (..., 2) float (x, y) pixel coords."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def describe(
    img: jnp.ndarray,
    uv: jnp.ndarray,  # (K,2)
    angle: jnp.ndarray,  # (K,) extraction direction [rad]
    valid: jnp.ndarray,  # (K,)
    smooth_sigma: float = 2.0,
    octave: jnp.ndarray = None,  # (K,) int32 pyramid level; scales the pattern
) -> jnp.ndarray:
    """Compute packed descriptors (K, 8) uint32. Invalid keypoints get 0.
    Keypoints from coarser octaves sample a 2^octave-scaled pattern (the
    reference's scale-dependent BRISK sampling)."""
    smoothed = gaussian_blur(img, sigma=smooth_sigma, radius=3)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    R = jnp.stack(
        [jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], axis=-2
    )  # (K,2,2)
    if octave is not None:
        R = R * jnp.exp2(octave.astype(img.dtype))[:, None, None]
    # rotate pattern per keypoint: (K, 256, pair-point, coord)
    rot = jnp.einsum("kij,paj->kpai", R, PATTERN)
    pos = uv[:, None, None, :] + rot  # (K,256,2,2)
    vals = _bilinear(smoothed, pos)  # (K,256,2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (K,256)
    words = bits.reshape(bits.shape[0], DESC_WORDS, 32)
    packed = jnp.sum(words * _BIT_WEIGHTS[None, None, :], axis=-1, dtype=jnp.uint32)
    return jnp.where(valid[:, None], packed, jnp.uint32(0))


def gravity_angles(
    uv: jnp.ndarray, gravity_in_cam: jnp.ndarray
) -> jnp.ndarray:
    """Extraction direction = image-plane projection of the camera-frame
    gravity direction (reference ``Frontend::detectAndDescribe`` passes
    g direction into ``describe``). One angle per keypoint (uniform — the
    per-pixel variation is negligible at VIO field of view).

    When gravity is nearly parallel to the optical axis the projection is
    degenerate (atan2 of noise → the extraction direction would spin frame
    to frame, destroying descriptor repeatability); fall back to angle 0.
    """
    gx, gy, gz = gravity_in_cam[0], gravity_in_cam[1], gravity_in_cam[2]
    in_plane = jnp.sqrt(gx * gx + gy * gy)
    stable = in_plane > 0.2 * jnp.abs(gz)
    ang = jnp.where(stable, jnp.arctan2(gy, gx), 0.0)
    return jnp.broadcast_to(ang, uv.shape[:-1])
