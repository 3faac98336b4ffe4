"""Backward warping by a flow field (PWC-Net / FlowNet2-style
alignment; the reference framework has no flow ops, SURVEY.md §2;
mount empty, §0).

``out[n, y, x] = img[n, y + v(y,x), x + u(y,x)]`` with bilinear
interpolation and edge-clamped sampling — the building block of
coarse-to-fine flow (warp the second frame's features by the
upsampled coarse flow so the next cost volume only has to explain the
RESIDUAL motion) and of unsupervised photometric losses.

Two TPU mappings, one semantics:

* :func:`warp_bilinear` — the general form.  One gather per image
  axis-pair: linear indices into the flattened H*W plane,
  ``jnp.take_along_axis`` over the four bilinear corners.  Unbounded
  displacement; XLA lowers the gather to a dynamic-gather loop —
  correct everywhere, bandwidth-shaped like a shuffle.
* :func:`warp_bounded` — gather-FREE for ``|flow| <= d``: the warp is
  decomposed over the static ``(2d+1)^2`` integer displacement grid
  (exactly the correlation-volume trick in reverse) — each term is a
  padded static slice times the per-pixel bilinear weight
  ``relu(1-|u-dx|) * relu(1-|v-dy|)``, so the whole op is elementwise
  multiply-adds XLA fuses into a few sweeps.  Flow is clamped to
  ``[-d, d]`` (callers pick d >= the true motion bound; inside the
  bound the result equals :func:`warp_bilinear` to float tolerance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split_flow(flow):
    if flow.shape[-1] != 2:
        raise ValueError(f"flow must be [..., 2] (u, v), got {flow.shape}")
    f = flow.astype(jnp.float32)
    return f[..., 0], f[..., 1]


def warp_bilinear(img: jax.Array, flow: jax.Array) -> jax.Array:
    """``[N,H,W,C] x [N,H,W,2] -> [N,H,W,C]`` backward warp.

    Samples ``img`` at ``(x + u, y + v)`` with bilinear interpolation;
    coordinates are clamped to the frame (edge replication), matching
    ``scipy.ndimage.map_coordinates(order=1, mode='nearest')``.
    Interpolation runs in f32; the output keeps ``img``'s dtype.
    """
    if img.shape[:3] != flow.shape[:3]:
        raise ValueError(f"img {img.shape} and flow {flow.shape} "
                         "disagree on [N, H, W]")
    n, h, w, c = img.shape
    u, v = _split_flow(flow)
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :] + u
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None] + v
    xx = jnp.clip(xx, 0.0, w - 1.0)
    yy = jnp.clip(yy, 0.0, h - 1.0)
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    wx = xx - x0
    wy = yy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    flat = img.astype(jnp.float32).reshape(n, h * w, c)

    def tap(yi, xi):
        idx = (yi * w + xi).reshape(n, h * w, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(n, h, w, c)

    wx = wx[..., None]
    wy = wy[..., None]
    out = ((1 - wy) * ((1 - wx) * tap(y0, x0) + wx * tap(y0, x1))
           + wy * ((1 - wx) * tap(y1, x0) + wx * tap(y1, x1)))
    return out.astype(img.dtype)


def warp_bounded(img: jax.Array, flow: jax.Array, *,
                 max_displacement: int = 4) -> jax.Array:
    """Gather-free bounded backward warp (see module docstring).

    Equals :func:`warp_bilinear` wherever ``|flow| <= max_displacement``
    component-wise (flow is clamped to that box first).  Cost is
    ``(2d+1)^2`` fused elementwise multiply-adds over the image — the
    TPU-preferred form at the d<=4 operating point of coarse-to-fine
    warping, where the upsampled coarse flow already explains all but
    a few pixels of motion.
    """
    if img.shape[:3] != flow.shape[:3]:
        raise ValueError(f"img {img.shape} and flow {flow.shape} "
                         "disagree on [N, H, W]")
    d = int(max_displacement)
    if d < 0:
        raise ValueError(f"max_displacement must be >= 0, got {d}")
    n, h, w, c = img.shape
    u, v = _split_flow(flow)
    u = jnp.clip(u, -d, d)
    v = jnp.clip(v, -d, d)
    # edge padding = the clamp semantics of warp_bilinear at borders
    padded = jnp.pad(img.astype(jnp.float32),
                     ((0, 0), (d, d), (d, d), (0, 0)), mode="edge")
    out = jnp.zeros((n, h, w, c), jnp.float32)
    for dy in range(-d, d + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(v - dy))
        for dx in range(-d, d + 1):
            wgt = wy * jnp.maximum(0.0, 1.0 - jnp.abs(u - dx))
            shifted = jax.lax.dynamic_slice(
                padded, (0, dy + d, dx + d, 0), (n, h, w, c))
            out = out + wgt[..., None] * shifted
    return out.astype(img.dtype)
