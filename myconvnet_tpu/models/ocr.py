"""Text recognition models (thirteenth task family — the reference is
a classification/segmentation/GAN framework, SURVEY.md §2; mount
empty, §0).

* :func:`crnn` — CRNN (Shi, Bai & Yao, 2016, "An End-to-End Trainable
  Neural Network for Image-based Sequence Recognition"): the paper's
  7-conv VGG-style trunk that collapses a 32-pixel-tall line image to
  a 1-pixel feature sequence, then two BiLSTM(256) layers
  (``ops/rnn.py`` — input matmuls hoisted out of the scan) and a
  per-frame projection to ``num_classes + 1`` CTC logits (blank = 0).
* :func:`crnn_conv` — same trunk, recurrence replaced by a dilated
  1-D conv context stack (receptive field ±15 frames): every op is an
  MXU matmul, no sequential scan — the TPU-throughput variant.
* :func:`tinyocr` — CPU-runnable smoke variant (conv context).

Input: ``[N, 32k, W, 1]`` grayscale in [0, 1] (k=1 for the paper
geometry).  Output: ``[N, W/4 - 1, num_classes + 1]`` frame logits in
f32 (CTC runs the log-softmax; class 0 is the blank, charset symbols
index from 1 — the convention ``ops/ctc.py`` documents).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.ops.pool import max_pool2d
from myconvnet_tpu.ops.rnn import bilstm


def _trunk(x, train, widths=(64, 128, 256, 512)):
    """CRNN conv trunk: 32-tall input -> [N, T, C] frame sequence.

    Geometry per the paper (table 1): two 2x2 pools halve H and W,
    two (2,1) pools halve H only, a final 2x2 VALID conv drops H from
    2 to 1 and trims one frame — T = W/4 - 1.
    """
    w1, w2, w3, w4 = widths
    h = nn.relu(nn.conv(x, w1, 3, name="conv1"))
    h = max_pool2d(h, 2, 2)                              # 16 x W/2
    h = nn.relu(nn.conv(h, w2, 3, name="conv2"))
    h = max_pool2d(h, 2, 2)                              # 8 x W/4
    h = nn.relu(nn.conv(h, w3, 3, name="conv3"))
    h = nn.relu(nn.conv(h, w3, 3, name="conv4"))
    h = max_pool2d(h, (2, 1), (2, 1))                    # 4 x W/4
    h = nn.relu(nn.batch_norm(nn.conv(h, w4, 3, use_bias=False,
                                      name="conv5"),
                              train=train, name="bn5"))
    h = nn.relu(nn.batch_norm(nn.conv(h, w4, 3, use_bias=False,
                                      name="conv6"),
                              train=train, name="bn6"))
    h = max_pool2d(h, (2, 1), (2, 1))                    # 2 x W/4
    h = nn.relu(nn.conv(h, w4, 2, padding="VALID", name="conv7"))
    # [N, 1, T, C] -> [N, T, C]: the height axis is gone, frames are
    # left-to-right image columns
    return jnp.squeeze(h, axis=1)


def crnn(x: jax.Array, num_classes: int = 36, *, train: bool = False,
         rnn_hidden: int = 256) -> jax.Array:
    """CRNN: conv trunk + 2x BiLSTM + CTC projection.

    ``num_classes`` counts SYMBOLS (charset size); the returned logit
    channel count is ``num_classes + 1`` for the blank at index 0.
    """
    h = _trunk(x, train)
    with nn.scope_named("rnn"):
        h = bilstm(h, rnn_hidden)
        h = bilstm(h, rnn_hidden)
    return nn.dense(h, num_classes + 1, name="fc").astype(jnp.float32)


def crnn_conv(x: jax.Array, num_classes: int = 36, *,
              train: bool = False, context_width: int = 512,
              dilations: tuple[int, ...] = (1, 2, 4, 8)) -> jax.Array:
    """CRNN trunk with a dilated-conv context head instead of LSTMs.

    Each context block is conv1d(k=3, dilation=d) + BN + ReLU with a
    residual add; stacking d = 1,2,4,8 gives every frame a ±15-frame
    receptive field — ample context for line recognition —
    while keeping the whole head on the MXU with zero sequential
    dependency.
    """
    h = _trunk(x, train)
    h = nn.conv1d(h, context_width, 1, name="proj")
    for d in dilations:
        with nn.scope_named("context"):
            r = nn.conv1d(h, context_width, 3, dilation=d,
                          use_bias=False, name="conv")
            r = nn.relu(nn.batch_norm(r, train=train, name="bn"))
            h = h + r
    return nn.dense(h, num_classes + 1, name="fc").astype(jnp.float32)


def tinyocr(x: jax.Array, num_classes: int = 8, *, train: bool = False,
            width: int = 16) -> jax.Array:
    """CPU smoke variant: narrow trunk + one conv-context block."""
    h = _trunk(x, train, widths=(width, width, 2 * width, 2 * width))
    h = nn.conv1d(h, 2 * width, 1, name="proj")
    with nn.scope_named("context"):
        r = nn.conv1d(h, 2 * width, 3, use_bias=False, name="conv")
        r = nn.relu(nn.batch_norm(r, train=train, name="bn"))
        h = h + r
    return nn.dense(h, num_classes + 1, name="fc").astype(jnp.float32)
