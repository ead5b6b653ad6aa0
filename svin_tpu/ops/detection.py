"""Keypoint detection: Harris corner score + NMS + spatially-capped top-K.

TPU-native replacement for the reference's BRISK
``ScaleSpaceFeatureDetector<HarrisScoreCalculator>`` (superbuild BRISK 2.0.8;
``Frontend.cpp:983-1007`` configures threshold 40, octaves 0 — i.e. a
single-scale Harris-scored detector, which is exactly what dense conv +
max-pool NMS + top_k expresses natively). Output is fixed-shape: K keypoint
slots (uv, score, valid) so downstream stages have static shapes.

A per-cell cap (grid bucketing) approximates BRISK's uniformity enforcement
and feeds the health monitor's per-quadrant counts.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .image import _separable_conv, gaussian_blur


# Config→response threshold mapping. The reference's detector threshold
# (detection_options.threshold, default 40 — Frontend.cpp:74-82) applies to
# BRISK's integer Harris response: raw 3x3 Sobel on uint8 intensities,
# descaled into a small integer range (>>18). Our response uses
# unit-normalized Sobel (raw/8) on [0,1] intensities, so responses differ
# by (8*255)^4 with the 2^18 descale: threshold 40 maps to ~6.05e-7 here.
BRISK_THRESHOLD_SCALE = float(2 ** 18) / float((8 * 255) ** 4)


class Keypoints(NamedTuple):
    uv: jnp.ndarray  # (K,2) float pixel coords (x, y) at full resolution
    score: jnp.ndarray  # (K,)
    angle: jnp.ndarray  # (K,) orientation [rad] (filled by descriptor stage)
    valid: jnp.ndarray  # (K,) bool
    octave: jnp.ndarray = None  # (K,) int32 pyramid level (0 = full res)


def harris_score(img: jnp.ndarray, k: float = 0.04, sigma: float = 1.0) -> jnp.ndarray:
    """Harris corner response on the full image (dense, fused convs)."""
    sobel = jnp.array([-0.5, 0.0, 0.5], img.dtype)
    smooth = jnp.array([0.25, 0.5, 0.25], img.dtype)

    def deriv_x(a):
        r = jnp.pad(a, ((0, 0), (1, 1)), mode="edge")
        gx = sum(r[:, i : i + a.shape[1]] * sobel[i] for i in range(3))
        c = jnp.pad(gx, ((1, 1), (0, 0)), mode="edge")
        return sum(c[i : i + a.shape[0], :] * smooth[i] for i in range(3))

    Ix = deriv_x(img)
    Iy = deriv_x(img.T).T
    Ixx = gaussian_blur(Ix * Ix, sigma=sigma, radius=2)
    Iyy = gaussian_blur(Iy * Iy, sigma=sigma, radius=2)
    Ixy = gaussian_blur(Ix * Iy, sigma=sigma, radius=2)
    det = Ixx * Iyy - Ixy * Ixy
    tr = Ixx + Iyy
    return det - k * tr * tr


def nms(score: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Keep local maxima in a (2r+1)² neighborhood (strict on ties via
    lexicographic index bias)."""
    n = 2 * radius + 1
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (n, n), (1, 1), "SAME"
    )
    return score >= mx


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2×2 mean pooling (one pyramid level down)."""
    h, w = img.shape
    h2, w2 = h // 2, w // 2
    return img[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3))


def _detect_level(
    img: jnp.ndarray,
    max_keypoints: int,
    threshold: float,
    cell: int,
    cell_cap: int,
    border: int,
):
    """Single-scale Harris + NMS + (optional per-cell cap) + top-K on one
    pyramid level; returns (uv, score, valid) in this level's pixels."""
    h, w = img.shape
    s = harris_score(img)
    keep = nms(s)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_border = (
        (xx >= border) & (xx < w - border) & (yy >= border) & (yy < h - border)
    )
    masked = jnp.where(keep & in_border & (s > threshold), s, -jnp.inf)
    if cell > 0:
        # keep the best `cell_cap` responses per tile: cell_cap rounds of
        # segment-max selection, suppressing each round's winners
        cells_y = -(-h // cell)
        cells_x = -(-w // cell)
        cell_id = (yy // cell) * cells_x + (xx // cell)
        n_cells = cells_y * cells_x
        flat_cells = cell_id.reshape(-1)
        remaining = masked.reshape(-1)
        selected = jnp.full(remaining.shape, -jnp.inf)
        for _ in range(cell_cap):
            cell_max = jax.ops.segment_max(
                remaining, flat_cells, num_segments=n_cells
            )
            is_win = (remaining == cell_max[flat_cells]) & jnp.isfinite(remaining)
            selected = jnp.where(is_win, remaining, selected)
            remaining = jnp.where(is_win, -jnp.inf, remaining)
        masked = selected.reshape(h, w)
    flat = masked.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_keypoints)
    uv = jnp.stack(
        [(idx % w).astype(jnp.float32), (idx // w).astype(jnp.float32)], axis=-1
    )
    valid = jnp.isfinite(scores)
    return uv, jnp.where(valid, scores, 0.0), valid


@partial(
    jax.jit,
    static_argnames=("max_keypoints", "cell", "cell_cap", "border", "octaves"),
)
def detect(
    img: jnp.ndarray,
    max_keypoints: int = 400,
    threshold: float = 1e-6,
    cell: int = 0,
    cell_cap: int = 8,
    border: int = 20,
    octaves: int = 0,
) -> Keypoints:
    """Detect up to K Harris corners. ``cell`` > 0 caps density to
    ``cell_cap`` keypoints per cell×cell tile (the uniformity enforcement of
    the reference's BRISK scale-space detector, expressed as cell_cap rounds
    of per-cell argmax + suppression — static shapes throughout).

    ``octaves`` > 0 adds coarser pyramid levels (2× downsampled each, the
    reference's scale-space detection, detection_options.octaves): each
    level detects independently, coordinates are mapped back to full
    resolution, and the global top-K by response is kept. Per-level response
    magnitudes are comparable because Harris is evaluated on the smoothed
    mean-pooled image with the same kernel."""
    levels = []
    im = img
    for L in range(octaves + 1):
        uv, score, valid = _detect_level(
            im, max_keypoints, threshold, cell, max(cell_cap >> L, 1),
            max(border >> L, 4),
        )
        s = float(1 << L)
        uv0 = uv * s + (s - 1.0) / 2.0  # center-aligned full-res coords
        levels.append(
            (uv0, score, valid, jnp.full(uv.shape[0], L, jnp.int32))
        )
        if L < octaves:
            im = _downsample2(im)
    if octaves == 0:
        uv0, score, valid, octv = levels[0]
    else:
        uv0 = jnp.concatenate([l[0] for l in levels])
        score = jnp.concatenate([l[1] for l in levels])
        valid = jnp.concatenate([l[2] for l in levels])
        octv = jnp.concatenate([l[3] for l in levels])
        top, idx = jax.lax.top_k(jnp.where(valid, score, -jnp.inf), max_keypoints)
        uv0, score, valid, octv = (
            uv0[idx], jnp.where(jnp.isfinite(top), top, 0.0),
            jnp.isfinite(top), octv[idx],
        )
    return Keypoints(
        uv=uv0,
        score=score,
        angle=jnp.zeros(max_keypoints, img.dtype),
        valid=valid,
        octave=octv,
    )


def quadrant_counts(kp: Keypoints, width: int, height: int) -> jnp.ndarray:
    """Per-image-quadrant keypoint counts (feeds the SvinHealth analog,
    reference Publisher.cpp:147-270)."""
    qx = (kp.uv[:, 0] >= width / 2).astype(jnp.int32)
    qy = (kp.uv[:, 1] >= height / 2).astype(jnp.int32)
    q = qy * 2 + qx
    return jax.ops.segment_sum(kp.valid.astype(jnp.int32), q, num_segments=4)
