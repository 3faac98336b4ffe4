"""Single-image super-resolution models (sixth task family, beyond the
reference's scope; mount empty, SURVEY.md §0).

* :func:`edsr` — EDSR (Lim et al., 2017): BN-free residual blocks with
  residual scaling, sub-pixel (pixel-shuffle) upsampling.  All compute
  happens at the LOW resolution until the final shuffle — on TPU that
  means every conv is an MXU matmul over r² fewer pixels than an
  output-resolution design.
* :func:`srresnet` / :func:`sr_discriminator` — the SRGAN pair (Ledig
  et al., 2017): BN + PReLU generator, VGG-style binary discriminator;
  trains through the fused dual-optimizer GAN step (train/gan.py).

Inputs are mean-subtracted [0, 1] RGB at the LR size; outputs are HR
residuals around the bicubic-ish mean (the recipe's normalize handles
the shift).  ``num_classes`` is accepted and ignored so the functions
fit the zoo's uniform ``fn(x, num_classes, train=)`` calling shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import init
from myconvnet_tpu.core.module import param


def area_downsample(hr: jax.Array, scale: int) -> jax.Array:
    """Exact box-mean downsample [N,H,W,C] -> [N,H/s,W/s,C].

    THE LR-synthesis contract shared by the SR recipe's train/eval
    transforms, the SRGAN recipe and test.py's SR evaluators — one
    definition so train and eval can never drift.  Pure reshape+mean:
    works on numpy and jax arrays alike.
    """
    n, h, w, c = hr.shape
    if h % scale or w % scale:
        raise ValueError(f"image {h}x{w} not divisible by scale {scale}")
    return hr.reshape(n, h // scale, scale, w // scale, scale,
                      c).mean((2, 4))


def center_crop_hw(x: jax.Array, size: int) -> jax.Array:
    """Center-crop [N,H,W,C] to [N,size,size,C]; rejects frames smaller
    than the crop (a negative slice start would silently return a
    wrong-shaped patch)."""
    h, w = x.shape[1:3]
    if h < size or w < size:
        raise ValueError(f"frame {h}x{w} smaller than crop {size}; "
                         "raise the corpus raw_hw or lower hr_size")
    y0, x0 = (h - size) // 2, (w - size) // 2
    return x[:, y0:y0 + size, x0:x0 + size]


def _prelu(x: jax.Array, name: str = "prelu") -> jax.Array:
    with nn.scope_named(name):
        a = param("alpha", (x.shape[-1],), jnp.float32,
                  lambda _k, s, d: jnp.full(s, 0.25, d))
    return jnp.where(x > 0, x, a.astype(x.dtype) * x)


def _upsampler(x: jax.Array, scale: int, width: int,
               name: str = "up") -> jax.Array:
    """conv -> pixel_shuffle stages; x2 repeated for scale 4."""
    if scale not in (2, 3, 4):
        raise ValueError(f"scale must be 2, 3 or 4, got {scale}")
    with nn.scope_named(name):
        stages = [2, 2] if scale == 4 else [scale]
        for i, r in enumerate(stages):
            x = nn.conv(x, width * r * r, 3, name=f"conv{i + 1}")
            x = nn.pixel_shuffle(x, r)
    return x


def edsr(x: jax.Array, num_classes: int = 0, *, train: bool = False,
         scale: int = 4, width: int = 64, blocks: int = 16,
         res_scale: float = 1.0) -> jax.Array:
    """EDSR forward: [N, h, w, 3] LR -> [N, h*scale, w*scale, 3].

    Defaults are the paper's BASELINE model (64/16, res_scale 1); the
    full EDSR is ``width=256, blocks=32, res_scale=0.1`` (residual
    scaling keeps the 256-wide sum stable).  ``train`` is accepted for
    API uniformity — EDSR has no BN/dropout."""
    del num_classes, train
    x = nn.conv(x, width, 3, name="head")
    skip = x
    for i in range(blocks):
        with nn.scope_named(f"block{i + 1}"):
            y = nn.relu(nn.conv(x, width, 3, name="conv1"))
            # zero-init the branch's closing conv (gamma-zero/Fixup
            # style): with He init every BN-free branch has gain ~2, so
            # 16+ stacked blocks amplify activation variance ~3^depth
            # and the untrained net emits +-1e4 images (measured).
            # Zero branches start the body as the identity.
            y = nn.conv(y, width, 3, w_init=init.zeros, name="conv2")
            x = x + res_scale * y
    x = nn.conv(x, width, 3, name="body_tail") + skip
    x = _upsampler(x, scale, width)
    # zero-init tail: the initial prediction is exactly the dataset
    # mean image, so loss/PSNR start at the predict-the-mean baseline
    return nn.conv(x, 3, 3, w_init=init.zeros, name="tail")


def tinysr(x: jax.Array, num_classes: int = 0, *, train: bool = False,
           scale: int = 2, **kw) -> jax.Array:
    """CPU-test scale EDSR (16 wide, 2 blocks, x2)."""
    kw.setdefault("width", 16)
    kw.setdefault("blocks", 2)
    return edsr(x, train=train, scale=scale, **kw)


# ------------------------------------------------------------------ SRGAN

def srresnet(x: jax.Array, num_classes: int = 0, *, train: bool = False,
             scale: int = 4, width: int = 64,
             blocks: int = 16) -> jax.Array:
    """SRResNet generator: BN + PReLU residual blocks, sub-pixel
    upsampler, tanh-free linear output (the recipe keeps images in
    mean-subtracted [0,1] space like EDSR)."""
    del num_classes
    x = nn.conv(x, width, 9, name="head")
    x = _prelu(x, name="head_act")
    skip = x
    for i in range(blocks):
        with nn.scope_named(f"block{i + 1}"):
            y = nn.conv(x, width, 3, use_bias=False, name="conv1")
            y = nn.batch_norm(y, train=train, name="bn1")
            y = _prelu(y, name="act")
            y = nn.conv(y, width, 3, use_bias=False, name="conv2")
            y = nn.batch_norm(y, train=train, name="bn2")
            x = x + y
    x = nn.conv(x, width, 3, use_bias=False, name="body_tail")
    x = nn.batch_norm(x, train=train, name="body_bn") + skip
    x = _upsampler(x, scale, width)
    # zero-init tail (same rationale as EDSR: start at the mean image)
    return nn.conv(x, 3, 9, w_init=init.zeros, name="tail")


def sr_discriminator(x: jax.Array, *, train: bool = False,
                     width: int = 64,
                     spectral_norm: bool = False) -> jax.Array:
    """SRGAN's VGG-style binary discriminator on HR images.
    Returns [N, 1] logits."""
    specs = [(width, 1), (width, 2), (2 * width, 1), (2 * width, 2),
             (4 * width, 1), (4 * width, 2), (8 * width, 1),
             (8 * width, 2)]
    for i, (w, s) in enumerate(specs):
        with nn.scope_named(f"conv{i + 1}"):
            x = nn.conv(x, w, 3, stride=s, use_bias=(i == 0),
                        spectral_norm=spectral_norm, name="conv")
            if i > 0:
                x = nn.batch_norm(x, train=train, name="bn")
            x = nn.leaky_relu(x, 0.2)
    x = jnp.mean(x, axis=(1, 2))          # global pool (any HR size)
    x = nn.leaky_relu(nn.dense(x, 16 * width, name="fc1"), 0.2)
    return nn.dense(x, 1, name="fc2")
