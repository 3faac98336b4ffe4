"""Pretrained-weight loading with cross-framework name mapping
(SURVEY.md §2#11: the reference restores pretrained backbones, e.g.
ImageNet-pretrained for DeepLab, with variable-name mapping).

Two import paths:

* ``load_npz_weights`` — our own checkpoint format (exact names).
* ``import_torch_resnet`` — a torch(vision)-style ResNet ``state_dict``
  (from a ``.pt``/``.pth`` file or an in-memory dict) mapped onto our
  parameter tree: OIHW -> HWIO conv transposition, running stats -> BN
  moving statistics, fc -> logits dense.  Used to warm-start DeepLab's
  backbone or serve torch-trained classifiers.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from myconvnet_tpu.core.module import Params, State


def load_npz_weights(path: str, params: Params) -> Params:
    """Load a flat ``scope::name`` npz into an existing param tree
    (subset restore allowed: only matching keys are replaced)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    out = {k: dict(v) for k, v in params.items()}
    for key, arr in flat.items():
        scope_name, _, pname = key.rpartition("::")
        if scope_name in out and pname in out[scope_name]:
            want = out[scope_name][pname].shape
            if tuple(arr.shape) != tuple(want):
                raise ValueError(f"{key}: shape {arr.shape} != {want}")
            out[scope_name][pname] = arr
    return out


# ---------------------------------------------------- torch resnet mapping

def _torch_block_names(depth: int):
    from myconvnet_tpu.models.resnet import STAGE_BLOCKS
    return STAGE_BLOCKS[depth]


def import_torch_resnet(state_dict: Mapping[str, Any], params: Params,
                        state: State, depth: int = 50,
                        load_head: bool = True, prefix: str = ""
                        ) -> tuple[Params, State]:
    """Map a torchvision-style ResNet state_dict onto our tree.

    Accepts numpy arrays or anything with ``.numpy()`` (torch tensors).
    Returns new (params, state); raises on any shape mismatch.

    ``prefix`` relocates the target scopes — e.g. ``"backbone/"`` to
    warm-start DeepLabv3+'s encoder (models/deeplab.py) from an
    ImageNet-pretrained torchvision backbone.

    Numerics note: torchvision pads strided convs/pools symmetrically;
    build the target model with ``torch_padding=True``
    (models/resnet.py) for exact logits agreement — with the default
    TF-SAME padding the stride-2 window alignment differs slightly
    (fine for fine-tuning warm starts, wrong for serving).
    """

    def arr(key):
        v = state_dict[key]
        return v if isinstance(v, np.ndarray) else v.detach().numpy()

    def conv_w(key):
        return np.transpose(arr(key), (2, 3, 1, 0))  # OIHW -> HWIO

    new_p = {k: dict(v) for k, v in params.items()}
    new_s = {k: dict(v) for k, v in state.items()}

    def put_conv(scope, key):
        w = conv_w(key)
        want = new_p[scope]["w"].shape
        if tuple(w.shape) != tuple(want):
            raise ValueError(f"{scope}: {w.shape} != {want}")
        new_p[scope]["w"] = w.astype(np.float32)

    def put_bn(scope, prefix):
        new_p[scope]["gamma"] = arr(f"{prefix}.weight").astype(np.float32)
        new_p[scope]["beta"] = arr(f"{prefix}.bias").astype(np.float32)
        new_s[scope]["moving_mean"] = arr(
            f"{prefix}.running_mean").astype(np.float32)
        new_s[scope]["moving_var"] = arr(
            f"{prefix}.running_var").astype(np.float32)

    put_conv(f"{prefix}stem/conv", "conv1.weight")
    put_bn(f"{prefix}stem/bn", "bn1")

    blocks = _torch_block_names(depth)
    bottleneck = depth >= 50
    letters = ("a", "b", "c") if bottleneck else ("a", "b")
    for stage_i, n_blocks in enumerate(blocks):
        for b in range(n_blocks):
            t_pre = f"layer{stage_i + 1}.{b}"
            scope_pre = f"{prefix}stage{stage_i + 1}/block{b + 1}"
            for li, letter in enumerate(letters):
                put_conv(f"{scope_pre}/conv_{letter}",
                         f"{t_pre}.conv{li + 1}.weight")
                put_bn(f"{scope_pre}/bn_{letter}", f"{t_pre}.bn{li + 1}")
            if f"{t_pre}.downsample.0.weight" in state_dict:
                put_conv(f"{scope_pre}/conv_proj",
                         f"{t_pre}.downsample.0.weight")
                put_bn(f"{scope_pre}/bn_proj", f"{t_pre}.downsample.1")

    head = f"{prefix}logits"
    if load_head and "fc.weight" in state_dict and head in new_p:
        w = np.transpose(arr("fc.weight"), (1, 0))
        if tuple(w.shape) == tuple(new_p[head]["w"].shape):
            new_p[head]["w"] = w.astype(np.float32)
            new_p[head]["b"] = arr("fc.bias").astype(np.float32)
    return new_p, new_s


def import_torch_resnet_file(path: str, params: Params, state: State,
                             depth: int = 50, load_head: bool = True,
                             prefix: str = ""):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_torch_resnet(sd, params, state, depth, load_head,
                               prefix=prefix)


# torchvision VGG16 `features` conv indices (the SSD trunk's 13 convs,
# conv1_1 .. conv5_3); the _bn variant interleaves BatchNorm at +1
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG16_BN_CONV_IDX = (0, 3, 7, 10, 14, 17, 20, 24, 27, 30, 34, 37, 40)


def import_torch_vgg16(state_dict: Mapping[str, Any], params: Params,
                       state: State, prefix: str = "backbone/"
                       ) -> tuple[Params, State]:
    """Map a torchvision vgg16/vgg16_bn state_dict onto an SSD trunk.

    The SSD detectors (models/ssd.py) start from the 13 VGG16 convs
    (conv1_1..conv5_3) — the reference workflow warm-starts them from
    ImageNet weights and trains fc6/fc7/extras/heads fresh (the paper's
    fc6/fc7 are *subsampled* classifier weights; we initialize them
    fresh instead, a standard simplification).  Auto-detects the _bn
    layout ("features.1.weight" present) and loads running stats into
    our `bn..bn_12` scopes; with the plain vgg16 layout only conv
    weights/biases load (build the model with use_bn=False to match).
    Returns new (params, state); raises on shape mismatch.
    """

    def arr(key):
        v = state_dict[key]
        return v if isinstance(v, np.ndarray) else v.detach().numpy()

    has_bn = "features.1.weight" in state_dict
    idxs = _VGG16_BN_CONV_IDX if has_bn else _VGG16_CONV_IDX
    model_has_bn = f"{prefix}bn" in params
    if has_bn != model_has_bn:
        # a silent mismatch here is a numerically CORRUPT warm start:
        # vgg16_bn -> use_bn=False model would drop every BN tensor;
        # plain vgg16 -> use_bn=True model would discard conv biases
        # against random-init BN stats
        raise ValueError(
            "vgg16 checkpoint/model BN mismatch: checkpoint "
            f"{'has' if has_bn else 'lacks'} BatchNorm but the target "
            f"model {'has' if model_has_bn else 'lacks'} it — build the "
            f"SSD trunk with use_bn={has_bn} to match")
    new_p = {k: dict(v) for k, v in params.items()}
    new_s = {k: dict(v) for k, v in state.items()}
    for i, t_idx in enumerate(idxs):
        scope = f"{prefix}conv" + ("" if i == 0 else f"_{i}")
        w = np.transpose(arr(f"features.{t_idx}.weight"),
                         (2, 3, 1, 0))  # OIHW -> HWIO
        want = new_p[scope]["w"].shape
        if tuple(w.shape) != tuple(want):
            raise ValueError(f"{scope}: {w.shape} != {want}")
        new_p[scope]["w"] = w.astype(np.float32)
        t_bias = f"features.{t_idx}.bias"
        bias = (arr(t_bias).astype(np.float32)
                if t_bias in state_dict else None)
        if bias is not None and "b" in new_p[scope]:
            new_p[scope]["b"] = bias
            bias = None  # consumed
        if has_bn:
            bn_scope = f"{prefix}bn" + ("" if i == 0 else f"_{i}")
            if bn_scope in new_p:
                t_bn = f"features.{t_idx + 1}"
                new_p[bn_scope]["gamma"] = arr(
                    f"{t_bn}.weight").astype(np.float32)
                new_p[bn_scope]["beta"] = arr(
                    f"{t_bn}.bias").astype(np.float32)
                mean = arr(f"{t_bn}.running_mean").astype(np.float32)
                if bias is not None:
                    # our BN convs are bias-free; torch's conv bias is
                    # a constant pre-BN shift, so it folds EXACTLY into
                    # the running mean: BN(conv + b) == BN'(conv) with
                    # mean' = mean - b
                    mean = mean - bias
                new_s[bn_scope]["moving_mean"] = mean
                new_s[bn_scope]["moving_var"] = arr(
                    f"{t_bn}.running_var").astype(np.float32)
    return new_p, new_s


def import_torch_vgg16_file(path: str, params: Params, state: State,
                            prefix: str = "backbone/"):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_torch_vgg16(sd, params, state, prefix=prefix)


def export_torch_resnet(params: Params, state: State, depth: int = 50
                        ) -> dict[str, np.ndarray]:
    """Inverse of :func:`import_torch_resnet`: emit a torchvision-style
    ResNet ``state_dict`` of numpy arrays (HWIO -> OIHW, BN stats ->
    running_*) so models trained here can serve from torch."""

    def conv_w(scope):
        return np.transpose(np.asarray(params[scope]["w"], np.float32),
                            (3, 2, 0, 1))  # HWIO -> OIHW

    sd: dict[str, np.ndarray] = {}

    def put_bn(prefix, scope):
        sd[f"{prefix}.weight"] = np.asarray(params[scope]["gamma"],
                                            np.float32)
        sd[f"{prefix}.bias"] = np.asarray(params[scope]["beta"], np.float32)
        sd[f"{prefix}.running_mean"] = np.asarray(
            state[scope]["moving_mean"], np.float32)
        sd[f"{prefix}.running_var"] = np.asarray(
            state[scope]["moving_var"], np.float32)

    sd["conv1.weight"] = conv_w("stem/conv")
    put_bn("bn1", "stem/bn")

    blocks = _torch_block_names(depth)
    letters = ("a", "b", "c") if depth >= 50 else ("a", "b")
    for stage_i, n_blocks in enumerate(blocks):
        for b in range(n_blocks):
            t_pre = f"layer{stage_i + 1}.{b}"
            scope_pre = f"stage{stage_i + 1}/block{b + 1}"
            for li, letter in enumerate(letters):
                sd[f"{t_pre}.conv{li + 1}.weight"] = conv_w(
                    f"{scope_pre}/conv_{letter}")
                put_bn(f"{t_pre}.bn{li + 1}", f"{scope_pre}/bn_{letter}")
            if f"{scope_pre}/conv_proj" in params:
                sd[f"{t_pre}.downsample.0.weight"] = conv_w(
                    f"{scope_pre}/conv_proj")
                put_bn(f"{t_pre}.downsample.1", f"{scope_pre}/bn_proj")

    if "logits" in params:
        sd["fc.weight"] = np.transpose(
            np.asarray(params["logits"]["w"], np.float32), (1, 0))
        sd["fc.bias"] = np.asarray(params["logits"]["b"], np.float32)

    # refuse silent information loss: every param scope must have been
    # exported (SE gates / ResNeXt extras have no torchvision slot)
    exported = {"stem/conv", "stem/bn", "logits"}
    for stage_i, n_blocks in enumerate(blocks):
        for b in range(n_blocks):
            pre = f"stage{stage_i + 1}/block{b + 1}"
            exported |= {f"{pre}/conv_{x}" for x in letters}
            exported |= {f"{pre}/bn_{x}" for x in letters}
            exported |= {f"{pre}/conv_proj", f"{pre}/bn_proj"}
    extra = sorted(set(params) - exported)
    if extra:
        raise ValueError(
            "params contain scopes with no torchvision ResNet slot "
            f"(e.g. SE blocks): {extra[:4]}{'...' if len(extra) > 4 else ''}"
            "; export supports plain ResNet/ResNeXt trees only")
    return sd


# ------------------------------------------------------- torch ViT mapping

def import_torch_vit(state_dict: Mapping[str, Any], params: Params,
                     state: State, load_head: bool = True, prefix: str = ""
                     ) -> tuple[Params, State]:
    """Map a torchvision-style ViT state_dict onto our tree.

    Key schema (torchvision ``vit_b_16`` et al.): ``conv_proj``,
    ``class_token``, ``encoder.pos_embedding``,
    ``encoder.layers.encoder_layer_{i}.{ln_1, self_attention, ln_2,
    mlp}``, ``encoder.ln``, ``heads.head`` (and optional
    ``heads.pre_logits``).  Both MLP key layouts are accepted
    (``mlp.0``/``mlp.3`` sequential indices — torchvision >= 0.13 — and
    the older ``mlp.linear_1``/``mlp.linear_2``).

    torch packs q, k, v row-blocks in ``in_proj_weight`` exactly like
    our fused qkv dense packs output features, so the projection maps
    by plain transpose; no per-head reshuffle is needed.

    If the checkpoint's position-embedding grid differs from the
    target's (different input resolution), the grid part is bilinearly
    resized (the standard ViT fine-tuning recipe) and the CLS slot kept.
    """

    def arr(key):
        v = state_dict[key]
        return v if isinstance(v, np.ndarray) else v.detach().numpy()

    new_p = {k: dict(v) for k, v in params.items()}
    new_s = {k: dict(v) for k, v in state.items()}

    def put(scope, pname, value):
        want = new_p[scope][pname].shape
        if tuple(value.shape) != tuple(want):
            raise ValueError(f"{scope}/{pname}: {value.shape} != {want}")
        new_p[scope][pname] = value.astype(np.float32)

    def put_dense(scope, w_key, b_key):
        put(scope, "w", np.transpose(arr(w_key), (1, 0)))
        put(scope, "b", arr(b_key))

    def put_ln(scope, pre):
        put(scope, "gamma", arr(f"{pre}.weight"))
        put(scope, "beta", arr(f"{pre}.bias"))

    put(f"{prefix}patch_embed", "w",
        np.transpose(arr("conv_proj.weight"), (2, 3, 1, 0)))
    put(f"{prefix}patch_embed", "b", arr("conv_proj.bias"))
    put(f"{prefix}~", "cls_token", arr("class_token"))

    pos = arr("encoder.pos_embedding").astype(np.float32)
    want = new_p[f"{prefix}~"]["pos_embed"].shape
    if tuple(pos.shape) != tuple(want):
        from myconvnet_tpu.ops.resize import resize_bilinear
        g_src = int(round((pos.shape[1] - 1) ** 0.5))
        g_dst = int(round((want[1] - 1) ** 0.5))
        if (g_src * g_src + 1, g_dst * g_dst + 1) != (pos.shape[1], want[1]):
            raise ValueError(f"pos_embed {pos.shape} -> {want}: "
                             "non-square grids cannot be resized")
        grid = pos[:, 1:].reshape(1, g_src, g_src, pos.shape[-1])
        grid = np.asarray(resize_bilinear(grid, (g_dst, g_dst),
                                          align_corners=True,
                                          half_pixel=False))
        pos = np.concatenate(
            [pos[:, :1], grid.reshape(1, g_dst * g_dst, pos.shape[-1])],
            axis=1)
    new_p[f"{prefix}~"]["pos_embed"] = pos

    n_blocks = sum(1 for s in new_p
                   if s.startswith(f"{prefix}block") and s.endswith("/ln1"))
    for i in range(n_blocks):
        t = f"encoder.layers.encoder_layer_{i}"
        s = f"{prefix}block{i + 1}"
        put_ln(f"{s}/ln1", f"{t}.ln_1")
        put(f"{s}/qkv", "w",
            np.transpose(arr(f"{t}.self_attention.in_proj_weight"), (1, 0)))
        put(f"{s}/qkv", "b", arr(f"{t}.self_attention.in_proj_bias"))
        put_dense(f"{s}/proj", f"{t}.self_attention.out_proj.weight",
                  f"{t}.self_attention.out_proj.bias")
        put_ln(f"{s}/ln2", f"{t}.ln_2")
        if f"{t}.mlp.linear_1.weight" in state_dict:
            fc1, fc2 = f"{t}.mlp.linear_1", f"{t}.mlp.linear_2"
        else:
            fc1, fc2 = f"{t}.mlp.0", f"{t}.mlp.3"
        put_dense(f"{s}/mlp/fc1", f"{fc1}.weight", f"{fc1}.bias")
        put_dense(f"{s}/mlp/fc2", f"{fc2}.weight", f"{fc2}.bias")

    put_ln(f"{prefix}ln", "encoder.ln")
    if load_head and "heads.head.weight" in state_dict:
        head = f"{prefix}head/logits"
        w = np.transpose(arr("heads.head.weight"), (1, 0))
        if head in new_p and tuple(w.shape) == tuple(new_p[head]["w"].shape):
            new_p[head]["w"] = w.astype(np.float32)
            new_p[head]["b"] = arr("heads.head.bias").astype(np.float32)
    if load_head and "heads.pre_logits.weight" in state_dict:
        pre = f"{prefix}head/pre_logits"
        if pre in new_p:
            put_dense(pre, "heads.pre_logits.weight",
                      "heads.pre_logits.bias")
    return new_p, new_s


def import_torch_vit_file(path: str, params: Params, state: State,
                          load_head: bool = True, prefix: str = ""):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_torch_vit(sd, params, state, load_head, prefix=prefix)


def export_torch_vit(params: Params) -> dict[str, np.ndarray]:
    """Inverse of :func:`import_torch_vit` (torchvision >= 0.13 MLP key
    layout): emit a torchvision-style ViT state_dict from our tree, for
    interop round-trip tests and torch-side serving."""
    sd: dict[str, np.ndarray] = {}

    def a(scope, pname):
        return np.asarray(params[scope][pname], dtype=np.float32)

    sd["conv_proj.weight"] = np.transpose(a("patch_embed", "w"),
                                          (3, 2, 0, 1))
    sd["conv_proj.bias"] = a("patch_embed", "b")
    sd["class_token"] = a("~", "cls_token")
    sd["encoder.pos_embedding"] = a("~", "pos_embed")
    exported = {"patch_embed", "~", "ln", "head/logits"}
    n_blocks = sum(1 for s in params
                   if s.startswith("block") and s.endswith("/ln1"))
    for i in range(n_blocks):
        t = f"encoder.layers.encoder_layer_{i}"
        s = f"block{i + 1}"
        sd[f"{t}.ln_1.weight"] = a(f"{s}/ln1", "gamma")
        sd[f"{t}.ln_1.bias"] = a(f"{s}/ln1", "beta")
        sd[f"{t}.self_attention.in_proj_weight"] = np.transpose(
            a(f"{s}/qkv", "w"), (1, 0))
        sd[f"{t}.self_attention.in_proj_bias"] = a(f"{s}/qkv", "b")
        sd[f"{t}.self_attention.out_proj.weight"] = np.transpose(
            a(f"{s}/proj", "w"), (1, 0))
        sd[f"{t}.self_attention.out_proj.bias"] = a(f"{s}/proj", "b")
        sd[f"{t}.ln_2.weight"] = a(f"{s}/ln2", "gamma")
        sd[f"{t}.ln_2.bias"] = a(f"{s}/ln2", "beta")
        sd[f"{t}.mlp.0.weight"] = np.transpose(a(f"{s}/mlp/fc1", "w"),
                                               (1, 0))
        sd[f"{t}.mlp.0.bias"] = a(f"{s}/mlp/fc1", "b")
        sd[f"{t}.mlp.3.weight"] = np.transpose(a(f"{s}/mlp/fc2", "w"),
                                               (1, 0))
        sd[f"{t}.mlp.3.bias"] = a(f"{s}/mlp/fc2", "b")
        exported |= {f"{s}/ln1", f"{s}/qkv", f"{s}/proj", f"{s}/ln2",
                     f"{s}/mlp/fc1", f"{s}/mlp/fc2"}
    sd["encoder.ln.weight"] = a("ln", "gamma")
    sd["encoder.ln.bias"] = a("ln", "beta")
    sd["heads.head.weight"] = np.transpose(a("head/logits", "w"), (1, 0))
    sd["heads.head.bias"] = a("head/logits", "b")
    extra = sorted(set(params) - exported)
    if extra:
        raise ValueError(f"params contain scopes with no torchvision ViT "
                         f"slot: {extra[:4]}"
                         f"{'...' if len(extra) > 4 else ''}")
    return sd


# torchvision vgg16.features conv indices (plain, no BN), in order
_VGG16_FEATURES_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def import_torch_vgg16_features(state_dict: Mapping[str, Any],
                                params: Params) -> Params:
    """Map torchvision ``vgg16().state_dict()`` conv weights onto THIS
    repo's ``models.vgg16(use_bn=False)`` params (sequential auto-named
    scopes ``conv .. conv_12``; the classifier head is left as-is —
    perceptual extraction never reads it).  OIHW -> HWIO transpose,
    shape-validated.  Plain-vgg16 layout only (no ``features.1.weight``
    BN marker); raises on a _bn checkpoint."""
    if "features.1.weight" in state_dict:
        raise ValueError("vgg16_bn checkpoint passed to the plain "
                         "(use_bn=False) features importer")

    def arr(key):
        v = state_dict[key]
        return v if isinstance(v, np.ndarray) else v.detach().numpy()

    scopes = ["conv"] + [f"conv_{i}" for i in range(1, 13)]
    new = {k: dict(v) for k, v in params.items()}
    for scope, idx in zip(scopes, _VGG16_FEATURES_IDX):
        w = np.transpose(arr(f"features.{idx}.weight"), (2, 3, 1, 0))
        b = arr(f"features.{idx}.bias")
        have_w = np.asarray(params[scope]["w"])
        have_b = np.asarray(params[scope]["b"])
        if w.shape != have_w.shape:
            raise ValueError(f"{scope}: torch features.{idx} shape "
                             f"{w.shape} != model {have_w.shape}")
        if b.shape != have_b.shape:
            raise ValueError(f"{scope}: torch features.{idx} bias "
                             f"shape {b.shape} != model {have_b.shape}")
        new[scope]["w"] = w.astype(have_w.dtype)
        new[scope]["b"] = b.astype(have_w.dtype)
    return new


def import_torch_vgg16_features_file(path: str, params: Params) -> Params:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_torch_vgg16_features(sd, params)
