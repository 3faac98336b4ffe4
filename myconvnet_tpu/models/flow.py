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
* :func:`pwcnet` — PWC-Net (Sun et al., 2018): 6-level siamese
  feature pyramid, coarse-to-fine estimation — at each level the
  second frame's features are WARPED by the upsampled coarser flow
  (``ops/warp.py``) so the cost volume only explains the residual
  motion (d=4 suffices at every level), sequential flow estimator,
  dilated-conv context refinement at the finest level.  Train mode
  returns the per-level flow pyramid for multi-scale deep
  supervision (``train/losses.py:multiscale_epe_loss``).
* :func:`tinyflow` / :func:`tinypwc` — CPU-runnable smoke variants.

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
from myconvnet_tpu.ops.warp import warp_bilinear, warp_bounded


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


def _pwc_estimator(h, widths, name, dense: bool = True):
    """Flow estimator; ``dense=True`` is the paper's released variant
    (DenseNet connections: each conv sees every earlier activation)."""
    with nn.scope_named(name):
        for i, ch in enumerate(widths):
            out = _conv(h, ch, 3, name=f"conv{i + 1}")
            h = jnp.concatenate([out, h], axis=-1) if dense else out
        flow = _flow_head(h)
    return h, flow


def _pwc_context(feat, flow, name="context"):
    """Dilated-conv refinement at the finest estimation level (the
    paper's context network: receptive-field growth without
    resolution loss — same mechanism as DeepLab's ASPP rates)."""
    h = jnp.concatenate([feat, flow.astype(feat.dtype)], axis=-1)
    with nn.scope_named(name):
        for i, (ch, rate) in enumerate(zip((128, 128, 128, 96, 64, 32),
                                           (1, 2, 4, 8, 16, 1))):
            h = _lrelu(nn.conv(h, ch, 3, dilation=rate,
                               name=f"conv{i + 1}"))
        return flow + _flow_head(h)


def pwcnet(x: jax.Array, num_classes: int = 0, *,
           train: bool = False, md: int = 4,
           pyramid: tuple = (16, 32, 64, 96, 128, 196),
           warp_backend: str = "gather"):
    """PWC-Net: ``[N,H,W,6]`` frame pair -> ``[N,H,W,2]`` flow
    (train mode: the coarse-to-fine list of per-level flows for
    multi-scale supervision; all flows are in FULL-RESOLUTION pixels
    at every level — the warp converts to level pixels internally, so
    there is no /20 magic scaling to carry around).

    Per level: warp frame 2's features by the upsampled coarser flow
    (gather form by default; ``warp_backend="bounded"`` uses the
    gather-free shift decomposition, exact while the accumulated flow
    stays within ``md`` level pixels), correlate (d=md residual
    search), estimate a residual flow; dilated-conv context
    refinement at 1/4 resolution, bilinear x4 out.

    Deviations from the official implementation, on purpose: flow
    heads are zero-initialized (training starts from the zero-flow
    prior) and the 2-channel upsampled-feature tap (upfeat) is
    omitted — upflow alone carries the coarse state.  The estimator
    keeps the paper's DenseNet connections (~9M params, the released
    model's scale)."""
    del num_classes
    stride = 2 ** len(pyramid)
    _check_pair(x, stride)
    warp = {"gather": lambda f, fl: warp_bilinear(f, fl),
            "bounded": lambda f, fl: warp_bounded(
                f, fl, max_displacement=md)}[warp_backend]

    def features(f):
        feats = []
        for li, ch in enumerate(pyramid, start=1):
            f = _conv(f, ch, 3, 2, name=f"conv{li}a")
            f = _conv(f, ch, 3, name=f"conv{li}aa")
            f = _conv(f, ch, 3, name=f"conv{li}b")
            feats.append(f)
        return feats

    with nn.scope_shared("pyr"):
        p1 = features(x[..., :3])
    with nn.scope_shared("pyr"):
        p2 = features(x[..., 3:])

    flows = []
    flow = None
    feat = None
    top = len(pyramid)
    for level in range(top, 1, -1):       # coarsest -> level 2
        f1, f2 = p1[level - 1], p2[level - 1]
        if flow is None:
            corr = _lrelu(correlation_volume(f1, f2,
                                             max_displacement=md))
            h = corr.astype(f1.dtype)
        else:
            up = resize_bilinear(flow, f1.shape[1:3])
            warped = warp(f2, up / float(2 ** level))
            corr = _lrelu(correlation_volume(f1, warped,
                                             max_displacement=md))
            h = jnp.concatenate(
                [corr.astype(f1.dtype), f1, up.astype(f1.dtype)],
                axis=-1)
        feat, res = _pwc_estimator(h, (128, 128, 96, 64, 32),
                                   f"est{level}")
        flow = res if flow is None else up + res
        flows.append(flow)
    flows[-1] = _pwc_context(feat, flows[-1])
    if train:
        return flows
    n, hh, ww, _ = flows[-1].shape
    return resize_bilinear(flows[-1], (hh * 4, ww * 4))


pwcnet.multiscale = True


def tinypwc(x: jax.Array, num_classes: int = 0, *,
            train: bool = False, md: int = 3,
            warp_backend: str = "bounded"):
    """CPU smoke PWC-Net: 2-level pyramid, coarse estimate at 1/4,
    warped residual estimate at 1/2, no context net.  Defaults to the
    gather-free bounded warp (the residual after the coarse level is
    within +-md level pixels by construction)."""
    del num_classes
    _check_pair(x, 4)
    warp = {"gather": lambda f, fl: warp_bilinear(f, fl),
            "bounded": lambda f, fl: warp_bounded(
                f, fl, max_displacement=md)}[warp_backend]

    def features(f):
        c1 = _conv(f, 16, 3, 2, name="enc1")           # 1/2
        c2 = _conv(c1, 32, 3, 2, name="enc2")          # 1/4
        return c1, c2

    with nn.scope_shared("pyr"):
        c1a, c2a = features(x[..., :3])
    with nn.scope_shared("pyr"):
        c1b, c2b = features(x[..., 3:])

    corr2 = _lrelu(correlation_volume(c2a, c2b, max_displacement=md))
    _, flow2 = _pwc_estimator(corr2.astype(c2a.dtype), (32, 32), "est2",
                              dense=False)

    up = resize_bilinear(flow2, c1a.shape[1:3])
    warped = warp(c1b, up / 2.0)
    corr1 = _lrelu(correlation_volume(c1a, warped, max_displacement=md))
    h = jnp.concatenate([corr1.astype(c1a.dtype), c1a,
                         up.astype(c1a.dtype)], axis=-1)
    _, res = _pwc_estimator(h, (32, 16), "est1", dense=False)
    flow1 = up + res
    if train:
        return [flow2, flow1]
    n, hh, ww, _ = flow1.shape
    return resize_bilinear(flow1, (hh * 2, ww * 2))


tinypwc.multiscale = True


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
