"""ResNet v1 family (18/34/50/101/152), NHWC, TPU-first.

Rebuild of the reference's ResNet `_build_model` (SURVEY.md §2#2, §3.4;
BASELINE config #2: ResNet-50 ImageNet-style is the headline benchmark).

TPU notes:
* NHWC + 3x3/1x1 convs map straight onto the MXU; no transposes anywhere.
* Stride-2 downsampling placed on the 3x3 conv (the "v1.5" variant) —
  better accuracy *and* better MXU utilization than stride on the 1x1.
* `output_stride` support (dilated late stages) so the same backbone
  serves DeepLabv3+ (SURVEY.md §2#3) without re-implementation.
* Final-BN gamma zero-init for residual branches (standard large-batch
  trick; keeps early training stable at big global batch).
"""

from __future__ import annotations

from functools import partial

import jax

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core import module

STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


def _bn(x, train, zero_init=False, name="bn", norm="batch"):
    """Stage normalization: "batch" (reference semantics, cross-replica
    under GSPMD) or "group" (batch-independent — the choice for tiny
    per-device batches under pipeline/accum microbatching)."""
    if norm == "group":
        c = x.shape[-1]
        # largest group count <= 32 that divides c (width knobs can
        # produce channel counts not divisible by 32)
        g = next(g for g in range(min(32, c), 0, -1) if c % g == 0)
        return nn.group_norm(x, groups=g,
                             gamma_init=init.zeros if zero_init else None,
                             name=name)
    return nn.batch_norm(x, train=train, momentum=0.9, eps=1e-5,
                         gamma_init=init.zeros if zero_init else None,
                         name=name)


def _pad3(dilation, torch_padding):
    """Padding for a 3x3 conv: torch pads symmetrically by the dilation
    on BOTH sides regardless of stride; TF-SAME differs from that only
    at stride 2 (it pads (d-? lo, hi) asymmetrically).  Explicit
    symmetric padding reproduces torch geometry bit-for-bit — required
    when running imported torchvision weights (models/pretrained.py)."""
    return ((dilation, dilation),) * 2 if torch_padding else "SAME"


def basic_block(x, features, *, stride, dilation, train, projection,
                norm="batch", ws=False, torch_padding=False):
    shortcut = x
    y = nn.conv(x, features, 3, stride=stride, dilation=dilation,
                padding=_pad3(dilation, torch_padding),
                use_bias=False, weight_standardization=ws, name="conv_a")
    y = _bn(y, train, name="bn_a", norm=norm)
    y = nn.relu(y)
    y = nn.conv(y, features, 3, dilation=dilation, use_bias=False,
                padding=_pad3(dilation, torch_padding),
                weight_standardization=ws, name="conv_b")
    y = _bn(y, train, zero_init=True, name="bn_b", norm=norm)
    if projection:
        shortcut = nn.conv(x, features, 1, stride=stride, use_bias=False,
                           weight_standardization=ws, name="conv_proj")
        shortcut = _bn(shortcut, train, name="bn_proj", norm=norm)
    return nn.relu(y + shortcut)


def se_block(x, ratio: int = 16, name: str = "se"):
    """Squeeze-and-Excitation (Hu et al.): GAP -> bottleneck MLP ->
    per-channel sigmoid gate.  Tiny dense layers + an elementwise scale
    — XLA fuses the gate into the surrounding block."""
    with nn.scope_named(name):
        c = x.shape[-1]
        s = nn.gap(x)
        s = nn.relu(nn.dense(s, max(c // ratio, 1), name="fc1"))
        s = jax.nn.sigmoid(nn.dense(s, c, name="fc2").astype(x.dtype))
        return x * s[:, None, None, :]


def bottleneck_block(x, features, *, stride, dilation, train, projection,
                     groups: int = 1, width_per_group: int = 64,
                     se_ratio: int = 0, norm: str = "batch",
                     ws: bool = False, torch_padding: bool = False):
    shortcut = x
    inner = features * width_per_group * groups // 64
    y = nn.conv(x, inner, 1, use_bias=False, weight_standardization=ws,
                name="conv_a")
    y = _bn(y, train, name="bn_a", norm=norm)
    y = nn.relu(y)
    # stride on the 3x3 (v1.5); grouped for the ResNeXt variants
    y = nn.conv(y, inner, 3, stride=stride, dilation=dilation,
                padding=_pad3(dilation, torch_padding),
                groups=groups, use_bias=False, weight_standardization=ws,
                name="conv_b")
    y = _bn(y, train, name="bn_b", norm=norm)
    y = nn.relu(y)
    y = nn.conv(y, 4 * features, 1, use_bias=False,
                weight_standardization=ws, name="conv_c")
    y = _bn(y, train, zero_init=True, name="bn_c", norm=norm)
    if se_ratio:
        y = se_block(y, se_ratio)
    if projection:
        shortcut = nn.conv(x, 4 * features, 1, stride=stride, use_bias=False,
                           weight_standardization=ws, name="conv_proj")
        shortcut = _bn(shortcut, train, name="bn_proj", norm=norm)
    return nn.relu(y + shortcut)


def resnet_backbone(x: jax.Array, depth: int = 50, *, train: bool = False,
                    output_stride: int = 32, width: int = 64,
                    return_low_level: bool = False,
                    return_stages: bool = False, stem: str = "conv7",
                    groups: int = 1, width_per_group: int = 64,
                    se_ratio: int = 0, norm: str = "batch",
                    ws: bool = False, torch_padding: bool = False,
                    remat_blocks: bool | str = False):
    """Feature extractor. Returns final feature map (and the end-of-stage-1
    low-level features when ``return_low_level`` — DeepLab decoder input).
    ``return_stages`` instead returns the list of all four stage outputs
    [C2, C3, C4, C5] (strides 4/8/16/32) — the FPN/detection tap points.

    Memory note: for big batches / 513x513 segmentation use the trainer's
    ``remat=True`` (full-forward rematerialization via jax.checkpoint) —
    HBM is the scarce resource on TPU, recompute FLOPs are not.
    """
    if depth not in STAGE_BLOCKS:
        raise ValueError(f"unsupported ResNet depth {depth}; "
                         f"valid: {sorted(STAGE_BLOCKS)}")
    if output_stride not in (8, 16, 32):
        raise ValueError("output_stride must be 8, 16 or 32")
    blocks = STAGE_BLOCKS[depth]
    if depth >= 50:
        block_fn = partial(bottleneck_block, groups=groups,
                           width_per_group=width_per_group,
                           se_ratio=se_ratio, norm=norm, ws=ws,
                           torch_padding=torch_padding)
    else:
        if groups != 1 or width_per_group != 64:
            raise ValueError("grouped (ResNeXt) blocks need depth >= 50")
        block_fn = partial(basic_block, norm=norm, ws=ws,
                           torch_padding=torch_padding)
        if se_ratio:
            raise ValueError("SE variants are built on bottleneck blocks "
                             "(depth >= 50)")

    with nn.scope_named("stem"):
        if stem == "s2d":
            # space-to-depth stem (MLPerf-style): 2x2 blocks fold into
            # channels, then a 4x4 stride-1 conv — same 112x112x64 output
            # and ~8x8 receptive field as conv7x7s2, but the conv sees 12
            # input channels instead of 3, which tiles far better on the
            # MXU (measured ~20% faster stem on v5e).
            n, h, w, c = x.shape
            z = x.reshape(n, h // 2, 2, w // 2, 2, c)
            z = z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2,
                                                      4 * c)
            x = nn.conv(z, width, 4, use_bias=False,
                        weight_standardization=ws, name="conv")
        else:
            x = nn.conv(x, width, 7, stride=2, use_bias=False,
                        padding=((3, 3), (3, 3)) if torch_padding
                        else "SAME",
                        weight_standardization=ws, name="conv")
        if torch_padding and stem == "s2d":
            raise ValueError("torch_padding reproduces the torchvision "
                             "conv7 stem; combine it with stem='conv7'")
        x = _bn(x, train, name="bn", norm=norm)
        x = nn.relu(x)
        x = nn.max_pool(x, 3, 2,
                        padding=((0, 0), (1, 1), (1, 1), (0, 0))
                        if torch_padding else "SAME")

    low_level = None
    stages = []
    current_stride = 4
    dilation = 1
    for stage, n_blocks in enumerate(blocks):
        features = width * (2 ** stage)
        stage_stride = 1 if stage == 0 else 2
        if current_stride >= output_stride and stage_stride == 2:
            # swap stride for dilation: keeps resolution for segmentation
            dilation *= 2
            stage_stride = 1
        out_ch = features * (4 if depth >= 50 else 1)
        with nn.scope_named(f"stage{stage + 1}"):
            for b in range(n_blocks):
                # projection shortcut only where the canonical network
                # has one: shape change (stride or channel growth).
                # Stage 1 of ResNet-18/34 keeps identity shortcuts
                # (64 -> 64, stride 1) — torchvision parity.
                with nn.scope_named(f"block{b + 1}"):
                    blk = partial(
                        block_fn, features=features,
                        stride=stage_stride if b == 0 else 1,
                        dilation=dilation, train=train,
                        projection=(b == 0 and
                                    (stage_stride != 1
                                     or x.shape[-1] != out_ch)))
                    # per-block remat: recompute this block's
                    # intermediates in backward instead of storing them
                    # — cuts saved-activation HBM traffic (the step's
                    # bandwidth floor) at local recompute cost.  True =
                    # recompute everything; "conv" = keep conv outputs,
                    # recompute only elementwise BN/ReLU tensors
                    if remat_blocks:
                        pol = remat_blocks if isinstance(remat_blocks,
                                                         str) else None
                        x = module.remat(blk, x, policy=pol)
                    else:
                        x = blk(x)
        current_stride *= stage_stride
        stages.append(x)
        if stage == 0:
            low_level = x
    x = nn.tag_intermediate("features", x)
    if return_stages:
        return stages
    if return_low_level:
        return x, low_level
    return x


def resnet(x: jax.Array, num_classes: int = 1000, depth: int = 50, *,
           train: bool = False, width: int = 64,
           stem: str = "conv7", groups: int = 1,
           width_per_group: int = 64, se_ratio: int = 0,
           norm: str = "batch", ws: bool = False,
           torch_padding: bool = False,
           remat_blocks: bool | str = False) -> jax.Array:
    """``norm="group"`` + ``ws=True`` is the BiT/big-transfer recipe:
    fully batch-independent training.  ``torch_padding=True`` swaps the
    strided ops' TF-SAME padding for torch's symmetric padding —
    required for numerical agreement when running weights imported from
    torchvision (models/pretrained.py)."""
    x = resnet_backbone(x, depth, train=train, width=width, stem=stem,
                        groups=groups, width_per_group=width_per_group,
                        se_ratio=se_ratio, norm=norm, ws=ws,
                        torch_padding=torch_padding,
                        remat_blocks=remat_blocks)
    x = nn.gap(x)
    return nn.dense(x, num_classes, w_init=init.glorot_uniform(),
                    name="logits")


resnet18 = partial(resnet, depth=18)
resnet34 = partial(resnet, depth=34)
resnet50 = partial(resnet, depth=50)
resnet101 = partial(resnet, depth=101)
resnet152 = partial(resnet, depth=152)

# squeeze-excitation and aggregated (grouped) variants
se_resnet50 = partial(resnet, depth=50, se_ratio=16)
se_resnet101 = partial(resnet, depth=101, se_ratio=16)
resnext50_32x4d = partial(resnet, depth=50, groups=32, width_per_group=4)
resnext101_32x8d = partial(resnet, depth=101, groups=32, width_per_group=8)
se_resnext50_32x4d = partial(resnet, depth=50, groups=32,
                             width_per_group=4, se_ratio=16)
