"""Optical-flow models (fifteenth task family — the reference is a
classification/segmentation/GAN framework, SURVEY.md §2; mount
empty, §0).

* :func:`flownet_s` — FlowNetSimple (Dosovitskiy et al., 2015): the
  paper's 9-conv contracting part over the channel-stacked frame
  pair ``[N, H, W, 6]``, refinement by upsample+conv with skip
  concats from conv5_1/conv4_1/conv3_1/conv2 down to 1/4 resolution,
  then a bilinear x4 to full-res ``[N, H, W, 2]`` flow (pixels, f32).
* :func:`flownet_c` — FlowNetCorr: a SHARED-WEIGHT two-stream
  feature trunk to 1/8 resolution, the static-slice correlation
  volume (``ops/correlation.py``, d=4 -> 81 channels) + a 1x1
  "redirect" tap of stream one, then the same trunk tail and
  refinement as S.
* :func:`tinyflow` — CPU-runnable smoke variant.

Design deviations from the reference implementation, on purpose:
upsampling is nearest+conv (no transposed-conv checkerboard; the
repo-wide choice) and the flow heads are ZERO-INITIALIZED so
training starts from the zero-flow prior instead of the paper's
/20 target scaling — same stabilization, one less magic constant.
Supervision is single-scale EPE on the final flow (the multi-scale
deep supervision of the paper is a training aid, not a capability —
recorded in docs/ROADMAP.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.ops.correlation import correlation_volume
from myconvnet_tpu.ops.resize import resize_bilinear, upsample2x_nearest


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


def _conv(x, ch, k, s=1, name="conv"):
    return _lrelu(nn.conv(x, ch, k, stride=s, name=name))


def _flow_head(x, name="flow"):
    # zero-init: step 0 predicts exactly zero flow everywhere
    return nn.conv(x, 2, 3, w_init=init.zeros, b_init=init.zeros,
                   name=name).astype(jnp.float32)


def _up_block(x, skip, ch, name):
    with nn.scope_named(name):
        x = upsample2x_nearest(x)
        x = _conv(x, ch, 3, name="conv")
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
    return x


def _refine(c2, c3, c41, c51, c61, width):
    """Shared FlowNet refinement: 1/64 -> 1/4, then bilinear x4."""
    h = _up_block(c61, c51, 8 * width, "up5")          # 1/32
    h = _up_block(h, c41, 4 * width, "up4")            # 1/16
    h = _up_block(h, c3, 2 * width, "up3")             # 1/8
    h = _up_block(h, c2, width, "up2")                 # 1/4
    h = _conv(h, width, 3, name="fuse")
    flow4 = _flow_head(h)                              # 1/4 res
    n, hh, ww, _ = flow4.shape
    return resize_bilinear(flow4, (4 * hh, 4 * ww))


def _check_pair(x, stride):
    if x.shape[-1] != 6:
        raise ValueError("flow models take channel-stacked frame "
                         f"pairs [N,H,W,6], got {x.shape}")
    if x.shape[1] % stride or x.shape[2] % stride:
        raise ValueError(f"input_hw must be divisible by {stride} "
                         f"(the encoder's total stride), got "
                         f"({x.shape[1]}, {x.shape[2]})")


def flownet_s(x: jax.Array, num_classes: int = 0, *,
              train: bool = False, width: int = 64) -> jax.Array:
    """FlowNetSimple: ``[N,H,W,6]`` frame pair -> ``[N,H,W,2]`` flow.

    ``width`` scales every stage (64 = the paper's geometry: conv
    widths 64/128/256/512/512/1024)."""
    del num_classes, train
    _check_pair(x, 64)
    c1 = _conv(x, width, 7, 2, name="conv1")           # 1/2
    c2 = _conv(c1, 2 * width, 5, 2, name="conv2")      # 1/4
    c3 = _conv(c2, 4 * width, 5, 2, name="conv3")      # 1/8
    c3 = _conv(c3, 4 * width, 3, name="conv3_1")
    c4 = _conv(c3, 8 * width, 3, 2, name="conv4")      # 1/16
    c4 = _conv(c4, 8 * width, 3, name="conv4_1")
    c5 = _conv(c4, 8 * width, 3, 2, name="conv5")      # 1/32
    c5 = _conv(c5, 8 * width, 3, name="conv5_1")
    c6 = _conv(c5, 16 * width, 3, 2, name="conv6")     # 1/64
    c6 = _conv(c6, 16 * width, 3, name="conv6_1")
    return _refine(c2, c3, c4, c5, c6, width)


def flownet_c(x: jax.Array, num_classes: int = 0, *,
              train: bool = False, width: int = 64,
              max_displacement: int = 4) -> jax.Array:
    """FlowNetCorr: shared two-stream trunk + correlation volume.

    d=4 at 1/8 features covers +-32 px of motion at full
    resolution — the paper's operating point."""
    del num_classes, train
    _check_pair(x, 64)
    f1, f2 = x[..., :3], x[..., 3:]

    def stream(f):
        c1 = _conv(f, width, 7, 2, name="conv1")       # 1/2
        c2 = _conv(c1, 2 * width, 5, 2, name="conv2")  # 1/4
        c3 = _conv(c2, 4 * width, 5, 2, name="conv3")  # 1/8
        return c2, c3

    # weight sharing: both frames through ONE set of trunk params
    with nn.scope_shared("trunk"):
        c2a, c3a = stream(f1)
    with nn.scope_shared("trunk"):
        _, c3b = stream(f2)

    corr = _lrelu(correlation_volume(
        c3a, c3b, max_displacement=max_displacement))
    redir = _conv(c3a, width // 2, 1, name="conv_redir")
    h = jnp.concatenate([corr.astype(redir.dtype), redir], axis=-1)
    c3 = _conv(h, 4 * width, 3, name="conv3_1")
    c4 = _conv(c3, 8 * width, 3, 2, name="conv4")      # 1/16
    c4 = _conv(c4, 8 * width, 3, name="conv4_1")
    c5 = _conv(c4, 8 * width, 3, 2, name="conv5")      # 1/32
    c5 = _conv(c5, 8 * width, 3, name="conv5_1")
    c6 = _conv(c5, 16 * width, 3, 2, name="conv6")     # 1/64
    c6 = _conv(c6, 16 * width, 3, name="conv6_1")
    return _refine(c2a, c3, c4, c5, c6, width)


def tinyflow(x: jax.Array, num_classes: int = 0, *,
             train: bool = False, width: int = 8,
             max_displacement: int = 4) -> jax.Array:
    """CPU smoke variant — a miniature FlowNetC: shared one-level
    trunk, correlation at 1/2 resolution (d=4 covers +-8 px of
    full-res motion), small decoder, zero-init head.  The
    displacement grid must RESOLVE the corpus motion: at 1/4
    resolution a +-4 px motion collapses into +-1 feature px and the
    net plateaus at the zero-flow prior; at 1/2 resolution the same
    motion spans +-2 feature px and val EPE drops 3.5 -> 1.7 in 400
    Adam steps (measured on the synthetic corpus)."""
    del num_classes, train
    _check_pair(x, 2)

    def stream(f):
        return _conv(f, 2 * width, 3, 2, name="enc1")  # 1/2

    with nn.scope_shared("trunk"):
        c1a = stream(x[..., :3])
    with nn.scope_shared("trunk"):
        c1b = stream(x[..., 3:])
    corr = _lrelu(correlation_volume(
        c1a, c1b, max_displacement=max_displacement))
    h = jnp.concatenate([corr.astype(c1a.dtype), c1a], axis=-1)
    h = _conv(h, 4 * width, 3, name="mid1")
    h = _conv(h, 4 * width, 3, name="mid2")
    h = _conv(h, 2 * width, 3, name="fuse")
    flow1 = _flow_head(h)
    n, hh, ww, _ = flow1.shape
    return resize_bilinear(flow1, (2 * hh, 2 * ww))
