"""RepVGG (Ding et al. 2021, "RepVGG: Making VGG-style ConvNets Great
Again") — structural re-parameterization.

Train-time block: 3x3-conv+BN  +  1x1-conv+BN  +  (identity BN when
shapes allow), summed, ReLU.  Deploy-time: the three branches fold
ALGEBRAICALLY into one 3x3 conv + bias, giving a plain VGG-style
conv stack — the ideal TPU serving shape (uniform 3x3 convs are this
MXU's best case: VGG-16 measures 62.5% nominal MFU on the round-3
chip where ResNet-50's branchy 1x1s read 33.5% — both against the
197 TF/s v5e bf16 peak, utils/mfu.py).

This slots into the serving story as a third folding level beyond
BN-folding (models/folding.py): :func:`deploy_params` produces the
weights for :func:`repvgg_deploy`, whose outputs match the train
architecture's eval forward exactly (``test_repvgg``), and which
exports through serving.export_inference like any classifier.

Widths follow the paper's A-series: stages of [1, 2, 4, 14, 1] blocks
at [64a, 64a, 128a, 256a, 512b] channels (stage 0 capped at 64),
stride 2 at each stage entry.  A0: a=0.75, b=2.5 (8.31M deploy
params); A1: a=1, b=2.5 (12.79M).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn

A_STAGES = (1, 2, 4, 14, 1)


def _widths(a: float, b: float):
    return (min(64, int(64 * a)), int(64 * a), int(128 * a),
            int(256 * a), int(512 * b))


def _block(x, cout, stride, train, name):
    cin = x.shape[-1]
    with nn.scope_named(name):
        # torch-symmetric (1,1) padding, NOT "SAME": at stride 2 XLA's
        # SAME pads (0,1), which would misalign the 3x3 center tap
        # with the 1x1 branch's sampling grid and break the
        # re-parameterization algebra
        y = nn.conv(x, cout, 3, stride=stride, use_bias=False,
                    padding=((1, 1), (1, 1)), name="conv3")
        y = nn.batch_norm(y, train=train, name="bn3")
        y1 = nn.conv(x, cout, 1, stride=stride, use_bias=False,
                     name="conv1")
        y1 = nn.batch_norm(y1, train=train, name="bn1")
        out = y + y1
        if stride == 1 and cin == cout:
            out = out + nn.batch_norm(x, train=train, name="bnid")
    return nn.relu(out)


def repvgg(x: jax.Array, num_classes: int = 1000, *,
           train: bool = False, a: float = 0.75, b: float = 2.5,
           stages=A_STAGES, dropout_rate: float = 0.0) -> jax.Array:
    """Train-architecture forward (multi-branch blocks)."""
    widths = _widths(a, b)
    for si, (n_blocks, w) in enumerate(zip(stages, widths)):
        for bi in range(n_blocks):
            stride = 2 if bi == 0 else 1
            x = _block(x, w, stride, train, f"stage{si}_block{bi}")
    x = nn.gap(x)
    if dropout_rate:
        x = nn.dropout(x, dropout_rate, train=train)
    return nn.dense(x, num_classes, name="logits")


repvgg_a0 = partial(repvgg, a=0.75, b=2.5)
repvgg_a1 = partial(repvgg, a=1.0, b=2.5)
tinyrepvgg = partial(repvgg, a=0.125, b=0.25, stages=(1, 1, 2, 2, 1))


# ----------------------------------------------- re-parameterization

def _fold_branch(w, bn, eps):
    """conv(W) -> BN  ==  conv(W', b'): scale each OUTPUT channel."""
    g = bn["gamma"] if "gamma" in bn else jnp.ones(w.shape[-1])
    beta = bn["beta"] if "beta" in bn else jnp.zeros(w.shape[-1])
    mu, var = bn["moving_mean"], bn["moving_var"]
    s = g * jax.lax.rsqrt(var + eps)
    return w * s, beta - mu * s


def deploy_params(params, state, *, eps: float = 1e-3):
    """Fold every block's three branches into one 3x3 conv + bias.

    Input: the TRAIN architecture's (params, state) from
    ``transform(repvgg).init`` / a trained checkpoint.  Output: a flat
    ``{block_scope: {"w": [3,3,cin,cout], "b": [cout]}}`` tree (plus
    the untouched head) for :func:`repvgg_deploy`.
    """
    out = {}
    blocks = sorted({k.split("/")[0] for k in params
                     if k.startswith("stage")})
    for blk in blocks:
        w3 = jnp.asarray(params[f"{blk}/conv3"]["w"], jnp.float32)
        bn3 = {**params[f"{blk}/bn3"], **state[f"{blk}/bn3"]}
        w, bias = _fold_branch(w3, bn3, eps)

        w1 = jnp.asarray(params[f"{blk}/conv1"]["w"], jnp.float32)
        bn1 = {**params[f"{blk}/bn1"], **state[f"{blk}/bn1"]}
        w1f, b1 = _fold_branch(w1, bn1, eps)
        w = w.at[1:2, 1:2].add(w1f)
        bias = bias + b1

        idk = f"{blk}/bnid"
        if idk in params or idk in state:
            cin = w3.shape[2]
            wid = jnp.zeros((3, 3, cin, cin), jnp.float32)
            wid = wid.at[1, 1].set(jnp.eye(cin))
            bnid = {**params.get(idk, {}), **state[idk]}
            widf, bid = _fold_branch(wid, bnid, eps)
            w = w + widf
            bias = bias + bid
        out[f"{blk}/conv"] = {"w": w, "b": bias}
    out["logits"] = {k: jnp.asarray(v) for k, v in
                     params["logits"].items()}
    return out


def repvgg_deploy(x: jax.Array, num_classes: int = 1000, *,
                  train: bool = False, a: float = 0.75, b: float = 2.5,
                  stages=A_STAGES) -> jax.Array:
    """Deploy-architecture forward: plain 3x3 conv + bias + ReLU stack
    (run under ``transform`` with the tree from :func:`deploy_params`).
    """
    del train
    widths = _widths(a, b)
    for si, (n_blocks, w) in enumerate(zip(stages, widths)):
        for bi in range(n_blocks):
            stride = 2 if bi == 0 else 1
            with nn.scope_named(f"stage{si}_block{bi}"):
                x = nn.conv(x, w, 3, stride=stride, use_bias=True,
                            padding=((1, 1), (1, 1)), name="conv")
            x = nn.relu(x)
    x = nn.gap(x)
    return nn.dense(x, num_classes, name="logits")


# name -> deploy-forward partial matching the train-time registry names
DEPLOY_FORWARDS = {
    "repvgg_a0": partial(repvgg_deploy, a=0.75, b=2.5),
    "repvgg_a1": partial(repvgg_deploy, a=1.0, b=2.5),
    "tinyrepvgg": partial(repvgg_deploy, a=0.125, b=0.25,
                          stages=(1, 1, 2, 2, 1)),
}
