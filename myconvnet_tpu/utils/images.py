"""Image artifact helpers: sample grids, mask colorization, overlays.

Observability sugar around the training/eval loops (SURVEY.md §5: the
reference's TensorBoard usage may include image summaries [LOW]); used
for in-run GAN sample grids, segmentation prediction dumps and
generate.py output.  Host-side numpy only — never in the jitted path.
"""

from __future__ import annotations

import math
import os

import numpy as np


def make_grid(images: np.ndarray, pad: int = 2,
              pad_value: int = 0) -> np.ndarray:
    """[N,H,W,C] uint8 -> one [GH,GW,C] uint8 grid (row-major, square-ish).
    """
    images = np.asarray(images)
    assert images.dtype == np.uint8 and images.ndim == 4, \
        "make_grid wants [N,H,W,C] uint8"
    n, h, w, c = images.shape
    side = int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / side))
    grid = np.full((rows * (h + pad) - pad, side * (w + pad) - pad, c),
                   pad_value, np.uint8)
    for i, img in enumerate(images):
        r, col = divmod(i, side)
        y, x = r * (h + pad), col * (w + pad)
        grid[y:y + h, x:x + w] = img
    return grid


def to_uint8(images, value_range: tuple[float, float] = (-1.0, 1.0)
             ) -> np.ndarray:
    """Float images in ``value_range`` -> uint8 [N,H,W,C]."""
    lo, hi = value_range
    x = (np.asarray(images, np.float32) - lo) / max(hi - lo, 1e-12)
    return (np.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def voc_palette(num_classes: int = 256) -> np.ndarray:
    """The standard VOC label palette ([num_classes, 3] uint8): class
    index bits spread across RGB bit-planes — stable, well-separated
    colors for any class count."""
    pal = np.zeros((num_classes, 3), np.uint8)
    for i in range(num_classes):
        c, r, g, b = i, 0, 0, 0
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        pal[i] = (r, g, b)
    return pal


def colorize_mask(mask: np.ndarray, num_classes: int | None = None,
                  ignore_label: int | None = 255) -> np.ndarray:
    """Int mask [H,W] or [N,H,W] -> RGB uint8 via the VOC palette;
    ``ignore_label`` pixels render white."""
    mask = np.asarray(mask)
    pal = voc_palette(256)
    safe = np.where((mask >= 0) & (mask < 256), mask, 0)
    rgb = pal[safe]
    if ignore_label is not None:
        rgb = np.where((mask == ignore_label)[..., None],
                       np.uint8(255), rgb)
    return rgb


def overlay_mask(image_u8: np.ndarray, mask: np.ndarray,
                 alpha: float = 0.5,
                 ignore_label: int | None = 255) -> np.ndarray:
    """Blend a colorized mask over an image (both [H,W,...] uint8)."""
    color = colorize_mask(mask, ignore_label=ignore_label)
    out = (np.asarray(image_u8, np.float32) * (1 - alpha)
           + color.astype(np.float32) * alpha)
    return np.clip(out, 0, 255).astype(np.uint8)


def save_png(path: str, image: np.ndarray) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from PIL import Image
    arr = np.asarray(image)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
    return path


def flow_to_color(flow: np.ndarray, max_mag: float | None = None
                  ) -> np.ndarray:
    """``[H, W, 2]`` flow -> ``[H, W, 3]`` uint8, Middlebury-style:
    hue = direction, saturation = magnitude (white = static).
    ``max_mag`` fixes the normalization (comparable frames); default
    is the 99th-percentile magnitude of this map.  NaN (unknown)
    pixels render black."""
    f = np.asarray(flow, np.float64)
    u, v = f[..., 0], f[..., 1]
    bad = ~np.isfinite(u) | ~np.isfinite(v)
    u = np.where(bad, 0.0, u)
    v = np.where(bad, 0.0, v)
    mag = np.sqrt(u * u + v * v)
    if max_mag is None:
        max_mag = max(float(np.percentile(mag, 99)), 1e-6)
    s = np.clip(mag / max_mag, 0.0, 1.0)
    h6 = (np.arctan2(-v, -u) / np.pi + 1.0) * 3.0  # [0, 6) hue sector
    i = np.floor(h6).astype(int) % 6
    frac = h6 - np.floor(h6)
    # interpolate around the RGB hue hexagon at full value
    wheel = np.array([[1, 0, 0], [1, 1, 0], [0, 1, 0],
                      [0, 1, 1], [0, 0, 1], [1, 0, 1]], np.float64)
    c0 = wheel[i]
    c1 = wheel[(i + 1) % 6]
    chroma = c0 * (1.0 - frac[..., None]) + c1 * frac[..., None]
    rgb = 1.0 - s[..., None] * (1.0 - chroma)  # desaturate to white
    rgb = np.where(bad[..., None], 0.0, rgb)
    return (rgb * 255.0 + 0.5).astype(np.uint8)
