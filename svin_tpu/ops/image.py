"""Image preprocessing ops: resize, blur, histogram equalization, CLAHE.

Replaces the reference's OpenCV preprocessing chain
(``okvis_ros/src/Subscriber.cpp:123-160``: resize by resizeFactor → optional
median blur → CLAHE or global hist-eq) with pure-XLA implementations on
(H, W) float32 images in [0, 1]. All ops are jit/vmap-safe with static
shapes; CLAHE uses a fixed tile grid with bilinear CDF blending (the
standard algorithm, expressed as dense per-tile histograms so the whole op
is one fused program).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def to_float(img: jnp.ndarray) -> jnp.ndarray:
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img.astype(jnp.float32)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize (align_corners=False, OpenCV-compatible sampling)."""
    h, w = img.shape
    ys = (jnp.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (jnp.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    top = img[y0i][:, x0i] * (1 - wx) + img[y0i][:, x1i] * wx
    bot = img[y1i][:, x0i] * (1 - wx) + img[y1i][:, x1i] * wx
    return top * (1 - wy[:, None]) + bot * wy[:, None]


def _separable_conv(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Same-size separable filter with edge replication."""
    r = k.shape[0] // 2
    p = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    rows = sum(p[i : i + img.shape[0], :] * k[i] for i in range(k.shape[0]))
    p = jnp.pad(rows, ((0, 0), (r, r)), mode="edge")
    return sum(p[:, i : i + img.shape[1]] * k[i] for i in range(k.shape[0]))


def gaussian_blur(img: jnp.ndarray, sigma: float = 1.0, radius: int = 2) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    return _separable_conv(img, k)


def median_blur3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 median filter (Subscriber.cpp medianBlur analog) via sorting the
    9 shifted copies."""
    p = jnp.pad(img, 1, mode="edge")
    h, w = img.shape
    stack = jnp.stack(
        [p[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
    )
    return jnp.sort(stack, axis=0)[4]


def hist_equalize(img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Global histogram equalization (cv::equalizeHist analog)."""
    v = jnp.clip(img, 0.0, 1.0)
    idx = jnp.clip((v * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros(bins, jnp.float32).at[idx.reshape(-1)].add(1.0)
    cdf = jnp.cumsum(hist)
    # OpenCV semantics: normalize by the first occupied bin's cdf
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, jnp.inf))
    return (cdf[idx] - cdf_min) / jnp.maximum(cdf[-1] - cdf_min, 1.0)


@partial(jax.jit, static_argnames=("tiles_y", "tiles_x", "bins"))
def clahe(
    img: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_y: int = 8,
    tiles_x: int = 8,
    bins: int = 256,
) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization
    (cv::createCLAHE analog; reference enables it via
    ``histogramMethod: CLAHE`` with ``claheClipLimit`` —
    VioParametersReader.cpp:266-303).

    The image is padded to a multiple of the tile grid; per-tile histograms
    are clipped at ``clip_limit × mean`` with uniform redistribution, turned
    into CDFs, and sampled with bilinear interpolation between the four
    surrounding tile CDFs.
    """
    h, w = img.shape
    th = -(-h // tiles_y)  # tile size, ceil
    tw = -(-w // tiles_x)
    ph, pw = th * tiles_y, tw * tiles_x
    pad = jnp.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    v = jnp.clip(pad, 0.0, 1.0)
    idx = jnp.clip((v * (bins - 1)).astype(jnp.int32), 0, bins - 1)

    tiles = idx.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(tiles_y * tiles_x, th * tw)
    one_hot_counts = jax.vmap(
        lambda t: jnp.zeros(bins, jnp.float32).at[t].add(1.0)
    )(tiles)  # (T, bins)

    # clip + redistribute (OpenCV semantics: limit relative to mean count)
    limit = jnp.maximum(clip_limit * (th * tw) / bins, 1.0)
    clipped = jnp.minimum(one_hot_counts, limit)
    excess = jnp.sum(one_hot_counts - clipped, axis=1, keepdims=True)
    clipped = clipped + excess / bins
    cdf = jnp.cumsum(clipped, axis=1)
    cdf = cdf / jnp.maximum(cdf[:, -1:], 1.0)
    cdf = cdf.reshape(tiles_y, tiles_x, bins)

    # bilinear blend of the 4 neighboring tile mappings at every pixel
    yy = jnp.arange(ph, dtype=jnp.float32)
    xx = jnp.arange(pw, dtype=jnp.float32)
    ty = (yy + 0.5) / th - 0.5
    tx = (xx + 0.5) / tw - 0.5
    ty0 = jnp.clip(jnp.floor(ty), 0, tiles_y - 1)
    tx0 = jnp.clip(jnp.floor(tx), 0, tiles_x - 1)
    ty1 = jnp.clip(ty0 + 1, 0, tiles_y - 1)
    tx1 = jnp.clip(tx0 + 1, 0, tiles_x - 1)
    wy = jnp.clip(ty - ty0, 0.0, 1.0)[:, None]
    wx = jnp.clip(tx - tx0, 0.0, 1.0)[None, :]
    ty0i, ty1i = ty0.astype(jnp.int32), ty1.astype(jnp.int32)
    tx0i, tx1i = tx0.astype(jnp.int32), tx1.astype(jnp.int32)

    def lookup(tyi, txi):
        # cdf[tyi[y], txi[x], idx[y,x]] for all pixels
        return cdf[tyi[:, None], txi[None, :], idx]

    out = (
        lookup(ty0i, tx0i) * (1 - wy) * (1 - wx)
        + lookup(ty0i, tx1i) * (1 - wy) * wx
        + lookup(ty1i, tx0i) * wy * (1 - wx)
        + lookup(ty1i, tx1i) * wy * wx
    )
    return out[:h, :w]


def preprocess(
    img: jnp.ndarray,
    resize_factor: float = 1.0,
    use_median: bool = False,
    histogram_method: str = "NONE",
    clahe_clip_limit: float = 2.0,
    clahe_tiles: int = 8,
) -> jnp.ndarray:
    """The Subscriber.cpp:123-160 preprocessing chain as one function:
    resize by ``resizeFactor`` → optional 3x3 median → CLAHE (clip limit +
    tile grid, ``claheTilesGridSize``) or global hist-eq. The resize output
    shape is static per (input shape, factor), matching the rescaled
    intrinsics from ``VioParametersReader``-style config loading."""
    out = to_float(img)
    if resize_factor != 1.0:
        out = resize_bilinear(
            out,
            int(round(out.shape[0] * resize_factor)),
            int(round(out.shape[1] * resize_factor)),
        )
    if use_median:
        out = median_blur3(out)
    method = histogram_method.upper()
    if method == "HISTOGRAM":
        out = hist_equalize(out)
    elif method == "CLAHE":
        out = clahe(
            out, clip_limit=clahe_clip_limit,
            tiles_y=clahe_tiles, tiles_x=clahe_tiles,
        )
    return out
