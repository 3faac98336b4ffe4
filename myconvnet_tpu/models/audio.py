"""Audio classification models (eleventh task family — the reference
is image-only, SURVEY.md §2; mount empty, §0).

Two complementary TPU mappings of the same task:

* :func:`m5` / :func:`m11` — raw-waveform 1-D CNNs (Dai et al., 2017,
  "Very Deep Convolutional Neural Networks for Raw Waveforms"): a
  long-receptive-field k=80 s=4 stem then k=3 stages with 4x max
  pools.  All convs ride ``ops/audio.conv1d`` (NWC -> MXU); parameter
  counts match the paper (m5: 0.56M, m11: 1.79M at 128 width).
* :func:`melspec_cnn` — the classical recipe: an on-device log-mel
  frontend (``ops/audio.log_mel_spectrogram``: STFT as ONE strided
  conv + mel matmul, zero gathers) feeding ANY 2-D backbone from the
  classification zoo on the [frames, mels, 1] image.  The frontend is
  part of the jitted program, so the host ships raw int16 waveforms
  and the whole feature chain fuses with the backbone's first conv.
* :func:`tinyaudio` — CPU-runnable smoke variant (same m5 code path).

Input: [N, T, 1] float waveforms in [-1, 1] (the recipe's augment_fns
normalize from int16 on device).  fn(x, num_classes, train=) -> logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.ops.audio import (global_avg_pool1d,
                                     log_mel_spectrogram, max_pool1d)


def _conv_bn_relu1d(x, ch: int, k: int, *, stride: int = 1, train,
                    name: str = "conv"):
    with nn.scope_named(name):
        h = nn.conv1d(x, ch, k, stride=stride, use_bias=False,
                      name="conv")
        return nn.relu(nn.batch_norm(h, train=train, name="bn"))


def _m_net(x, num_classes, *, train, stem_width: int, stem_k: int,
           stem_stride: int, stages: tuple[tuple[int, int], ...],
           pool: int = 4):
    """Dai et al. template: big-stride stem, pooled k=3 stages."""
    h = _conv_bn_relu1d(x, stem_width, stem_k, stride=stem_stride,
                        train=train, name="stem")
    h = max_pool1d(h, pool)
    for i, (ch, blocks) in enumerate(stages):
        with nn.scope_named("stage"):
            for _ in range(blocks):
                h = _conv_bn_relu1d(h, ch, 3, train=train)
        if i < len(stages) - 1:
            h = max_pool1d(h, pool)
    h = global_avg_pool1d(h)
    return nn.dense(h, num_classes, name="fc").astype(jnp.float32)


def m5(x: jax.Array, num_classes: int = 35, *, train: bool = False,
       width: int = 128) -> jax.Array:
    """M5: k=80 s=4 stem then 3 single-conv stages (w, 2w, 4w)."""
    return _m_net(x, num_classes, train=train, stem_width=width,
                  stem_k=80, stem_stride=4,
                  stages=((width, 1), (2 * width, 1), (4 * width, 1)))


def m11(x: jax.Array, num_classes: int = 35, *, train: bool = False,
        width: int = 64) -> jax.Array:
    """M11: k=80 s=4 stem then (w x2, 2w x2, 4w x3, 8w x2) stages."""
    return _m_net(x, num_classes, train=train, stem_width=width,
                  stem_k=80, stem_stride=4,
                  stages=((width, 2), (2 * width, 2), (4 * width, 3),
                          (8 * width, 2)))


def tinyaudio(x: jax.Array, num_classes: int = 8, *,
              train: bool = False, width: int = 8) -> jax.Array:
    """CPU smoke variant of the m-net template."""
    return _m_net(x, num_classes, train=train, stem_width=width,
                  stem_k=16, stem_stride=4,
                  stages=((width, 1), (2 * width, 1)))


def melspec_cnn(x: jax.Array, num_classes: int = 35, *,
                train: bool = False, backbone: str = "smallnet",
                sample_rate: int = 16000, n_fft: int = 400,
                hop: int = 160, n_mels: int = 64,
                fmin: float = 0.0, fmax: float | None = None,
                backbone_kwargs: dict | None = None) -> jax.Array:
    """On-device log-mel frontend + any 2-D classification backbone.

    The [N, frames, n_mels, 1] log-mel image is standardized per
    example (speech log-energies are far from the zoo's ImageNet
    input statistics) before entering the backbone.
    """
    from myconvnet_tpu import models  # lazy: avoid circular import
    lm = log_mel_spectrogram(x.astype(jnp.float32),
                             sample_rate=sample_rate, n_fft=n_fft,
                             hop=hop, n_mels=n_mels, fmin=fmin,
                             fmax=fmax)
    mean = jnp.mean(lm, axis=(1, 2, 3), keepdims=True)
    std = jnp.std(lm, axis=(1, 2, 3), keepdims=True)
    lm = (lm - mean) / (std + 1e-5)
    fn = models.CLASSIFIERS.get(backbone)
    if fn is None:
        raise ValueError(f"unknown melspec backbone {backbone!r}")
    with nn.scope_named("backbone"):
        return fn(lm, num_classes, train=train,
                  **(backbone_kwargs or {}))
