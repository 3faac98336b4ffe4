"""Segmentation inference protocols: multi-scale + flip, sliding window.

The DeepLab evaluation protocol (the reference's segmentation family,
SURVEY.md §2#3) scores with logits averaged over several input scales
and the horizontal mirror, and crops big images with an overlapping
sliding window.  TPU-native constraints shape the implementation:

* every distinct scale is its own static shape → a small fixed set of
  compiled programs (scales are a tuple, not data);
* per-scale logit re-alignment to the base grid is the matmul-form
  bilinear resize (ops/resize.py) — MXU work, no gathers;
* the sliding-window blend is a host-side accumulation over a static
  tile grid, each tile running the same compiled program.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu.ops.resize import resize_bilinear


def multiscale_logits(forward: Callable[[jax.Array], jax.Array],
                      images: jax.Array, *,
                      scales: Sequence[float] = (0.75, 1.0, 1.25),
                      flip: bool = True) -> jax.Array:
    """Average per-pixel probabilities over scales (and mirrors).

    forward: x [N,h,w,C_in] -> logits [N,h',w',C] (any output stride —
    logits are resized back to the base grid).  images: [N,H,W,C_in]
    float at base resolution.  Returns log of the averaged softmax at
    base resolution [N,H,W,C].
    """
    n, h, w, _ = images.shape
    acc = None
    count = 0
    for s in scales:
        sh, sw = max(int(round(h * s)), 1), max(int(round(w * s)), 1)
        x = resize_bilinear(images, (sh, sw)) if (sh, sw) != (h, w) \
            else images
        variants = [x, x[:, :, ::-1, :]] if flip else [x]
        for i, v in enumerate(variants):
            logits = forward(v)
            if i == 1:  # un-mirror the prediction
                logits = logits[:, :, ::-1, :]
            logits = logits.astype(jnp.float32)
            if logits.shape[1:3] != (h, w):
                logits = resize_bilinear(logits, (h, w))
            p = jax.nn.softmax(logits, axis=-1)
            acc = p if acc is None else acc + p
            count += 1
    return jnp.log(acc / count + 1e-12)


def sliding_window_logits(forward: Callable[[jax.Array], jax.Array],
                          images: np.ndarray, tile_hw: tuple[int, int],
                          *, overlap: float = 1.0 / 3.0) -> np.ndarray:
    """Tile a large image batch, run ``forward`` per tile, blend overlaps.

    images: [N,H,W,C] (numpy or jax) with H,W >= tile size.  The tile
    grid is static (derived from shapes), every tile reuses ONE compiled
    program, and overlapping logits average with uniform weights.
    Returns [N,H,W,num_classes] float32 logits (host array).
    """
    images = np.asarray(images)
    n, h, w, _ = images.shape
    th, tw = tile_hw
    th, tw = min(th, h), min(tw, w)
    stride_h = max(int(th * (1.0 - overlap)), 1)
    stride_w = max(int(tw * (1.0 - overlap)), 1)
    ys = _tile_starts(h, th, stride_h)
    xs = _tile_starts(w, tw, stride_w)

    # ``forward`` is called as-is: pass a jitted function (or one that
    # closes over a jitted apply) — wrapping here would build a fresh
    # jit cache per call and recompile on every batch of an eval loop
    fwd = forward
    out = None
    weight = np.zeros((1, h, w, 1), np.float32)
    for y0 in ys:
        for x0 in xs:
            tile = jnp.asarray(images[:, y0:y0 + th, x0:x0 + tw, :])
            logits = np.asarray(fwd(tile), np.float32)
            if logits.shape[1:3] != (th, tw):
                logits = np.asarray(
                    resize_bilinear(jnp.asarray(logits), (th, tw)),
                    np.float32)
            if out is None:
                out = np.zeros((n, h, w, logits.shape[-1]), np.float32)
            out[:, y0:y0 + th, x0:x0 + tw, :] += logits
            weight[:, y0:y0 + th, x0:x0 + tw, :] += 1.0
    assert np.all(weight > 0), "tile grid left uncovered pixels"
    return out / weight


def _tile_starts(size: int, tile: int, stride: int) -> list[int]:
    """Start offsets covering [0, size) fully; last tile is flush."""
    starts = list(range(0, max(size - tile, 0) + 1, stride))
    if starts[-1] + tile < size:
        starts.append(size - tile)
    return starts
