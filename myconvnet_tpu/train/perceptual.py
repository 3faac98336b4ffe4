"""Perceptual (feature-space) losses: Gram-matrix style, feature
content, total variation (Johnson et al. 2016; Gatys et al. 2015).

The feature extractor is the repo's own VGG-16 (``models/vgg.py``,
``use_bn=False`` — the torchvision ``vgg16.features`` layout, so
``models/pretrained.py`` can feed it ImageNet weights) read through
the zero-overhead ``tag_intermediate`` taps each relu carries.  The
whole extraction is ordinary jitted forward compute: features of the
generated AND target images, the Gram matmuls (one MXU einsum per
layer) and the losses all fuse into the SAME XLA program as the
generator's fwd/bwd — no second dispatch, no host round-trips.

The VGG parameters are data to that program (frozen constants), never
optimizer state: gradients flow through the features to the GENERATED
image only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu.core import transform
from myconvnet_tpu.core.module import collecting

# Johnson's VGG-16 taps: style at four depths, content at relu2_2
STYLE_LAYERS = ("relu1_2", "relu2_2", "relu3_3", "relu4_3")
CONTENT_LAYER = "relu2_2"

# torchvision ImageNet normalization — the extractor's input space
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def make_vgg_extractor(layers=STYLE_LAYERS):
    """-> (transformed, features_fn).  ``transformed.init`` makes the
    (frozen) VGG params; ``features_fn(params, state, x)`` maps a
    [N,H,W,3] image in [0,1] to {layer: [N,h,w,c]} activations."""
    from myconvnet_tpu import models

    wanted = tuple(layers)

    def fwd(x, train=False):
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = (x.astype(jnp.float32) - mean) / std
        return models.vgg16(x, 1000, train=train, use_bn=False)

    t = transform(fwd)

    def features(params, state, x):
        with collecting() as c:
            t.apply(params, state, None, x, False)
        out = {}
        for key, v in c.items():
            name = key.rsplit("/", 1)[-1]
            if name in wanted:
                out[name] = v
        missing = set(wanted) - set(out)
        if missing:
            raise KeyError(f"VGG taps not found: {sorted(missing)} "
                           f"(have {sorted(c)})")
        return out

    return t, features


def gram_matrix(f: jax.Array) -> jax.Array:
    """[N,H,W,C] -> [N,C,C] channel co-occurrence, normalized by
    H*W*C (Johnson's scaling).  One MXU einsum."""
    n, h, w, c = f.shape
    f = f.reshape(n, h * w, c).astype(jnp.float32)
    return jnp.einsum("npc,npd->ncd", f, f) / float(h * w * c)


def style_loss(feats: dict, target_grams: dict) -> jax.Array:
    """Sum of squared Frobenius distances between Gram matrices.
    ``target_grams`` values broadcast over the batch ([1,C,C] or
    [N,C,C])."""
    loss = 0.0
    for name, g_t in target_grams.items():
        g = gram_matrix(feats[name])
        loss = loss + jnp.mean(
            jnp.sum(jnp.square(g - g_t), axis=(1, 2)))
    return loss


def content_loss(feats: dict, target_feats: dict,
                 layer: str = CONTENT_LAYER) -> jax.Array:
    """Squared-error feature distance at one layer, mean over all
    elements (Johnson's relu2_2 content term)."""
    a = feats[layer].astype(jnp.float32)
    b = target_feats[layer].astype(jnp.float32)
    return jnp.mean(jnp.square(a - b))


def tv_loss(x: jax.Array) -> jax.Array:
    """Anisotropic total variation (mean |forward difference|)."""
    xf = x.astype(jnp.float32)
    dh = jnp.abs(xf[:, 1:, :, :] - xf[:, :-1, :, :])
    dw = jnp.abs(xf[:, :, 1:, :] - xf[:, :, :-1, :])
    return jnp.mean(dh) + jnp.mean(dw)
