"""SiamFC single-object tracking (Bertinetto et al. 2016, "Fully-
Convolutional Siamese Networks for Object Tracking").  Sixteenth task
family — the reference is a single-image framework (SURVEY.md §2;
mount empty, §0); tracking exercises the framework's siamese
weight-sharing, per-sample correlation and response-map training
machinery.

Input convention (static shapes, ONE tensor on the wire): the model
consumes ``[N, H, W, 6]`` uint8->float blobs — channels 0-2 hold the
SEARCH crop at full ``(H, W)``, channels 3-5 hold the EXEMPLAR crop
padded into the top-left ``exemplar_hw`` corner (the rest of that
half is dead padding the first slice drops).  This keeps every task
family on the same "one input tensor + one target tensor" data-path
contract (prefetcher, sharding, serving all unchanged) at a ~37%
transfer overhead for the dead corner — host->device bytes, not HBM
working set.

Both crops run through ONE shared embedding (``nn.scope_shared``) and
score via :func:`~myconvnet_tpu.ops.xcorr.cross_correlate`; the
response is scaled by a learned (scalar) affine, SiamFC's trick for
keeping the logistic loss in range.  All convs are VALID — padding
would break the correlation's translation equivariance (the paper's
"fully-convolutional" requirement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import param
from myconvnet_tpu.ops.pool import max_pool2d
from myconvnet_tpu.ops.xcorr import cross_correlate


def _cbr(x, ch, k, s, train, name, final: bool = False):
    x = nn.conv(x, ch, k, stride=s, padding="VALID",
                use_bias=final, name=name)
    if not final:
        with nn.scope_named(name + "_bn"):
            x = nn.batch_norm(x, train=train)
        x = nn.relu(x)
    return x


def _embed(x, train, width):
    """The SiamFC AlexNet-style embedding, total stride 4 here (two
    stride-2 stages; the paper's stride-8 variant needs 255px search
    crops — stride 4 keeps the default 128px recipe's response map at
    the paper's 17x17 while halving the crop bytes)."""
    x = _cbr(x, width, 7, 2, train, "conv1")
    x = max_pool2d(x, 3, 2, padding="VALID")
    x = _cbr(x, 2 * width, 3, 1, train, "conv2")
    x = _cbr(x, 3 * width, 3, 1, train, "conv3")
    return _cbr(x, 4 * width, 3, 1, train, "conv5", final=True)


def siamfc(x: jax.Array, num_classes: int = 0, *, train: bool = False,
           width: int = 48,
           exemplar_hw: tuple[int, int] = (64, 64)) -> jax.Array:
    """``[N, H, W, 6]`` blob -> ``[N, R, R]`` f32 response map.

    Total stride 4: with the default 128px search / 64px exemplar the
    response is 17x17 covering +-32px of target motion."""
    del num_classes
    he, we = exemplar_hw
    search = x[..., :3]
    exemplar = x[:, :he, :we, 3:]
    with nn.scope_shared("embed"):
        fs = _embed(search, train, width)
    with nn.scope_shared("embed"):
        fe = _embed(exemplar, train, width)
    resp = cross_correlate(fs, fe)
    with nn.scope_named("head"):
        # learned affine keeps the logistic loss in range (the paper
        # fixes scale=1e-3; learning it removes the hand-tuning)
        scale = param("scale", (), jnp.float32, init.constant(1e-3))
        bias = param("bias", (), jnp.float32, init.zeros)
    return resp * scale + bias


def tinysiamfc(x: jax.Array, num_classes: int = 0, *,
               train: bool = False, width: int = 8,
               exemplar_hw: tuple[int, int] = (32, 32)) -> jax.Array:
    """CPU-smoke variant: 64px search / 32px exemplar, stride 4,
    9x9 response (+-16px motion)."""
    del num_classes
    he, we = exemplar_hw
    search = x[..., :3]
    exemplar = x[:, :he, :we, 3:]

    def emb(v):
        v = _cbr(v, width, 3, 2, train, "conv1")
        v = _cbr(v, 2 * width, 3, 2, train, "conv2")
        return _cbr(v, 2 * width, 3, 1, train, "conv3", final=True)

    with nn.scope_shared("embed"):
        fs = emb(search)
    with nn.scope_shared("embed"):
        fe = emb(exemplar)
    resp = cross_correlate(fs, fe)
    with nn.scope_named("head"):
        scale = param("scale", (), jnp.float32, init.constant(1e-3))
        bias = param("bias", (), jnp.float32, init.zeros)
    return resp * scale + bias


# response-map geometry: total embedding stride of both variants
SIAMFC_STRIDE = 4
