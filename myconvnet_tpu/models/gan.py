"""GAN model family: DCGAN and pix2pix generators/discriminators, NHWC
(BASELINE config #5; SURVEY.md §2#4, §3.5).

The reference alternates two ``Session.run`` calls (D step, G step) over
separate variable scopes.  Here the G and D forwards are independent
transformed functions whose *updates are fused into one jitted
dual-optimizer step* in ``train/gan.py`` — the TPU-native shape of the
same capability.

DCGAN follows Radford et al.: transposed-conv generator (tanh output),
strided-conv discriminator with leaky-ReLU and BN.  pix2pix follows
Isola et al.: U-Net generator with skip connections, 70x70 PatchGAN
discriminator, instance-norm option.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init

_W_INIT = init.normal(0.02)  # DCGAN-standard N(0, 0.02) everywhere


# ------------------------------------------------------------------- DCGAN

def dcgan_generator(z: jax.Array, *, train: bool = False,
                    out_channels: int = 3, base_features: int = 512,
                    image_size: int = 64) -> jax.Array:
    """z: [N, latent_dim] -> images [N, image_size, image_size, C] in [-1,1].
    """
    n_up = 0
    size = 4
    while size < image_size:
        size *= 2
        n_up += 1
    x = nn.dense(z, 4 * 4 * base_features, use_bias=False, w_init=_W_INIT,
                 name="project")
    x = x.reshape(-1, 4, 4, base_features)
    x = nn.batch_norm(x, train=train, momentum=0.9, name="bn_project")
    x = nn.relu(x)
    feats = base_features
    for i in range(n_up - 1):
        feats //= 2
        x = nn.conv_transpose(x, feats, 4, stride=2, use_bias=False,
                              w_init=_W_INIT)
        x = nn.batch_norm(x, train=train, momentum=0.9)
        x = nn.relu(x)
    x = nn.conv_transpose(x, out_channels, 4, stride=2, w_init=_W_INIT,
                          name="to_rgb")
    return nn.tanh(x)


def dcgan_discriminator(x: jax.Array, *, train: bool = False,
                        base_features: int = 64,
                        spectral_norm: bool = False) -> jax.Array:
    """images [N,H,W,C] -> logits [N, 1].  ``spectral_norm`` swaps BN
    for SN on every conv/dense (SNGAN recipe — Lipschitz-bounded D,
    pairs with the hinge objective)."""
    feats = base_features
    n_down = 0
    size = x.shape[1]
    while size > 4:
        size //= 2
        n_down += 1
    for i in range(n_down):
        # bias on every conv under SN (no BN to absorb the shift; the
        # SNGAN reference keeps biases) — else only with no following BN
        x = nn.conv(x, feats, 4, stride=2,
                    use_bias=(i == 0) or spectral_norm,
                    spectral_norm=spectral_norm, w_init=_W_INIT)
        if i > 0 and not spectral_norm:  # DCGAN: no BN on first conv
            x = nn.batch_norm(x, train=train, momentum=0.9)
        x = nn.leaky_relu(x, 0.2)
        feats = min(feats * 2, 512)
    x = x.reshape(x.shape[0], -1)
    return nn.dense(x, 1, spectral_norm=spectral_norm, w_init=_W_INIT,
                    name="logits")


# ----------------------------------------------------------------- pix2pix

def unet_generator(x: jax.Array, *, train: bool = False,
                   out_channels: int = 3, base_features: int = 64,
                   n_levels: int = 8, norm: str = "batch") -> jax.Array:
    """pix2pix U-Net: encoder-decoder with skips. Input/output in [-1,1]."""
    def norm_layer(h):
        if norm == "batch":
            return nn.batch_norm(h, train=train, momentum=0.9)
        return nn.instance_norm(h)

    n_levels = min(n_levels, 1 + max(0, (x.shape[1]).bit_length() - 1))
    skips = []
    feats_seq = [min(base_features * (2 ** i), 512) for i in range(n_levels)]
    h = x
    # encoder: conv s2 -> (norm) -> lrelu (no norm on first/innermost)
    for i, feats in enumerate(feats_seq):
        with nn.scope_named(f"enc{i + 1}"):
            h = nn.conv(h, feats, 4, stride=2, use_bias=(i == 0 or
                        i == n_levels - 1), w_init=_W_INIT, name="conv")
            if 0 < i < n_levels - 1:
                h = norm_layer(h)
        skips.append(h)
        h = nn.leaky_relu(h, 0.2)
    # decoder: deconv s2 -> norm -> (dropout x3) -> relu, skip concat
    for i in range(n_levels - 1, 0, -1):
        feats = feats_seq[i - 1]
        with nn.scope_named(f"dec{i + 1}"):
            h = nn.conv_transpose(h, feats, 4, stride=2, use_bias=False,
                                  w_init=_W_INIT, name="deconv")
            h = norm_layer(h)
            if i >= n_levels - 3:
                h = nn.dropout(h, 0.5, train=train)
        h = nn.relu(jnp.concatenate([h, skips[i - 1]], axis=-1))
    with nn.scope_named("dec1"):
        h = nn.conv_transpose(h, out_channels, 4, stride=2, w_init=_W_INIT,
                              name="deconv")
    return nn.tanh(h)


def patchgan_discriminator(x: jax.Array, y: jax.Array | None = None, *,
                           train: bool = False, base_features: int = 64,
                           n_layers: int = 3, norm: str = "batch",
                           spectral_norm: bool = False) -> jax.Array:
    """70x70 PatchGAN: conditional pairs (x, y) -> patch logits
    [N, H/8-ish, W/8-ish, 1].  ``spectral_norm`` replaces the norm
    layers with SN on every conv (Lipschitz-bounded D)."""
    h = x if y is None else jnp.concatenate([x, y], axis=-1)
    sn = spectral_norm

    def norm_layer(t):
        if sn:
            return t
        if norm == "batch":
            return nn.batch_norm(t, train=train, momentum=0.9)
        return nn.instance_norm(t)

    h = nn.conv(h, base_features, 4, stride=2, spectral_norm=sn,
                w_init=_W_INIT)
    h = nn.leaky_relu(h, 0.2)
    feats = base_features
    for i in range(1, n_layers):
        feats = min(feats * 2, 512)
        h = nn.conv(h, feats, 4, stride=2, use_bias=sn,
                    spectral_norm=sn, w_init=_W_INIT)
        h = norm_layer(h)
        h = nn.leaky_relu(h, 0.2)
    feats = min(feats * 2, 512)
    h = nn.conv(h, feats, 4, stride=1, use_bias=sn, spectral_norm=sn,
                w_init=_W_INIT)
    h = norm_layer(h)
    h = nn.leaky_relu(h, 0.2)
    return nn.conv(h, 1, 4, stride=1, spectral_norm=sn, w_init=_W_INIT,
                   name="logits")


# ---------------------------------------------------------------- cyclegan

def resnet_generator(x: jax.Array, *, train: bool = False,
                     out_channels: int = 3, base_features: int = 64,
                     n_blocks: int = 6,
                     norm: str = "instance") -> jax.Array:
    """CycleGAN's Johnson-style generator: c7s1-64, d128, d256,
    ``n_blocks`` residual blocks, u128, u64, c7s1-3 tanh.  Instance norm
    per the paper (no running stats — every apply is pure).  SAME
    zero-padding instead of reflect padding: XLA pads inside the conv
    fusion, and the 1-2 px border difference is immaterial next to the
    adversarial objective."""
    def norm_layer(h):
        if norm == "batch":
            return nn.batch_norm(h, train=train, momentum=0.9)
        return nn.instance_norm(h)

    with nn.scope_named("stem"):
        h = nn.conv(x, base_features, 7, use_bias=False, w_init=_W_INIT,
                    name="conv")
        h = nn.relu(norm_layer(h))
    feats = base_features
    for i in range(2):  # d128, d256
        feats *= 2
        with nn.scope_named(f"down{i + 1}"):
            h = nn.conv(h, feats, 3, stride=2, use_bias=False,
                        w_init=_W_INIT, name="conv")
            h = nn.relu(norm_layer(h))
    for i in range(n_blocks):
        with nn.scope_named(f"res{i + 1}"):
            r = nn.conv(h, feats, 3, use_bias=False, w_init=_W_INIT,
                        name="conv1")
            r = nn.relu(norm_layer(r))
            r = nn.conv(r, feats, 3, use_bias=False, w_init=_W_INIT,
                        name="conv2")
            h = h + norm_layer(r)
    for i in range(2):  # u128, u64
        feats //= 2
        with nn.scope_named(f"up{i + 1}"):
            h = nn.conv_transpose(h, feats, 3, stride=2, use_bias=False,
                                  w_init=_W_INIT, name="deconv")
            h = nn.relu(norm_layer(h))
    with nn.scope_named("to_rgb"):
        h = nn.conv(h, out_channels, 7, w_init=_W_INIT, name="conv")
    return nn.tanh(h)
