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

from functools import partial
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


# host numpy constants — they become jit-time constants inside `describe`;
# module-level jnp arrays would initialize the XLA backend at import time,
# which breaks jax.distributed.initialize ordering in multi-host bootstraps
PATTERN = _make_pattern().astype(np.float32)  # (256,2,2)
_BIT_WEIGHTS = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)


@partial(jax.jit, static_argnames=("smooth_sigma", "max_octave"))
def describe(
    img: jnp.ndarray,
    uv: jnp.ndarray,  # (K,2)
    angle: jnp.ndarray,  # () or (K,) extraction direction [rad] — SHARED:
    # one direction per call (the reference extracts along the per-frame
    # gravity direction, Frontend.cpp:91-113; BRISK likewise discretizes
    # orientation). If an array is passed, its first element is used.
    valid: jnp.ndarray,  # (K,)
    smooth_sigma: float = 2.0,
    octave: jnp.ndarray = None,  # (K,) int32 pyramid level; scales the pattern
    max_octave: int = 0,  # static bound on octave values (selection matrices)
) -> jnp.ndarray:
    """Compute packed descriptors (K, 8) uint32. Invalid keypoints get 0.
    Keypoints from coarser octaves sample a 2^octave-scaled pattern (the
    reference's scale-dependent BRISK sampling).

    TPU-native sampling: because the extraction direction is shared, the 512
    sample positions (relative to the keypoint) are identical for every
    keypoint of an octave. Each keypoint's patch is DMA-extracted once
    (contiguous dynamic_slice, keypoint anchored to its nearest pixel) and
    all bilinear samples become ONE (K, P²) × (P², 512) matmul against a
    4-nonzeros-per-column bilinear selection matrix — MXU work instead of
    ~K·512 XLA gathers (≈ 50× faster on TPU at K=400)."""
    K = uv.shape[0]
    dtype = img.dtype
    ang = jnp.asarray(angle).reshape(-1)
    ang0 = ang[0] if ang.shape[0] > 0 else jnp.asarray(0.0, dtype)
    smoothed = gaussian_blur(img, sigma=smooth_sigma, radius=3)

    R_max = int(PATCH_RADIUS) * (1 << max_octave) + 2
    P = 2 * R_max + 2  # patch side, covers bilinear corners at max scale
    pad = P
    padded = jnp.pad(smoothed, pad, mode="edge")
    xi = jnp.round(uv[:, 0]).astype(jnp.int32)
    yi = jnp.round(uv[:, 1]).astype(jnp.int32)
    oy = yi - P // 2 + pad
    ox = xi - P // 2 + pad
    patches = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(padded, (y, x), (P, P))
    )(oy, ox).reshape(K, P * P)

    ca, sa = jnp.cos(ang0), jnp.sin(ang0)
    R = jnp.array([[ca, -sa], [sa, ca]], dtype)
    base = jnp.asarray(PATTERN).reshape(2 * DESC_BITS, 2) @ R.T  # (512,2) rotated (x,y)
    cols = jnp.arange(2 * DESC_BITS)
    vals = None
    for L in range(max_octave + 1):
        pos = base * float(1 << L) + (P // 2)
        x0f = jnp.floor(pos[:, 0])
        y0f = jnp.floor(pos[:, 1])
        fx = (pos[:, 0] - x0f).astype(dtype)
        fy = (pos[:, 1] - y0f).astype(dtype)
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        Wsel = jnp.zeros((P * P, 2 * DESC_BITS), dtype)
        for dy, dx, w in (
            (0, 0, (1 - fx) * (1 - fy)),
            (0, 1, fx * (1 - fy)),
            (1, 0, (1 - fx) * fy),
            (1, 1, fx * fy),
        ):
            Wsel = Wsel.at[(y0 + dy) * P + (x0 + dx), cols].add(w)
        v_L = patches @ Wsel  # (K, 512) — the MXU does all the sampling
        if vals is None:
            vals = v_L
        else:
            vals = jnp.where((octave == L)[:, None], v_L, vals)
    vals = vals.reshape(K, DESC_BITS, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (K,256)
    words = bits.reshape(bits.shape[0], DESC_WORDS, 32)
    packed = jnp.sum(
        words * jnp.asarray(_BIT_WEIGHTS)[None, None, :], axis=-1,
        dtype=jnp.uint32,
    )
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
