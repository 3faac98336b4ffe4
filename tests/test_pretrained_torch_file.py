"""Real torch-generated checkpoint round-trips (VERDICT r1 next #5).

Round 1 proved the name mapping only against synthetic dicts; these
tests build a byte-faithful torchvision-layout ResNet IN torch (exact
module names -> exact state_dict keys, BatchNorm running buffers,
num_batches_tracked), ``torch.save`` it, import the file through
``import_torch_resnet_file``, and require logits agreement between the
torch model and our JAX model on the same inputs (torch_padding=True
reproduces torch's symmetric stride-2 padding).  No network needed:
the weights are random, the *format* is the thing under test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn

from myconvnet_tpu import models  # noqa: E402
from myconvnet_tpu.core import transform  # noqa: E402
from myconvnet_tpu.models.pretrained import (  # noqa: E402
    import_torch_resnet_file)


# ---------------------------------------------------------------------
# A torchvision-faithful ResNet: module attribute names chosen so the
# state_dict keys match torchvision's exactly (conv1, bn1, layerN.M.*,
# downsample.0/.1, fc) — verified against the torchvision key schema.
# ---------------------------------------------------------------------

class _Basic(tnn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        s = x if self.downsample is None else self.downsample(x)
        return torch.relu(y + s)


class _Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        # stride on the 3x3: torchvision's v1.5 convention
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, 4 * planes, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(4 * planes)
        self.downsample = downsample

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        s = x if self.downsample is None else self.downsample(x)
        return torch.relu(y + s)


class _TorchResNet(tnn.Module):
    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make(block, 64, layers[0], 1)
        self.layer2 = self._make(block, 128, layers[1], 2)
        self.layer3 = self._make(block, 256, layers[2], 2)
        self.layer4 = self._make(block, 512, layers[3], 2)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512 * block.expansion, num_classes)

    def _make(self, block, planes, n, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * block.expansion, 1,
                           stride, bias=False),
                tnn.BatchNorm2d(planes * block.expansion))
        blocks = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        blocks += [block(self.inplanes, planes) for _ in range(n - 1)]
        return tnn.Sequential(*blocks)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def _save_torch_resnet(block, layers, num_classes, path, seed=0):
    torch.manual_seed(seed)
    tm = _TorchResNet(block, layers, num_classes)
    # push the BN running buffers off their init (mean 0 / var 1) so the
    # import provably carries REAL statistics, not defaults
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            tm(torch.randn(4, 3, 64, 64))
    tm.eval()
    torch.save(tm.state_dict(), str(path))
    return tm


def _torchvision_key_schema_ok(sd, depth):
    """The format claim itself: exact torchvision key names present."""
    keys = set(sd.keys())
    assert "conv1.weight" in keys
    assert "bn1.running_mean" in keys and "bn1.num_batches_tracked" in keys
    assert "fc.weight" in keys and "fc.bias" in keys
    assert "layer1.0.conv1.weight" in keys
    if depth >= 50:
        assert "layer1.0.conv3.weight" in keys
        assert "layer1.0.downsample.0.weight" in keys
        assert "layer4.2.bn3.running_var" in keys
    else:
        assert "layer2.0.downsample.1.running_var" in keys


@pytest.mark.slow
def test_torch_file_resnet50_logits_agree(tmp_path):
    path = tmp_path / "r50.pth"
    tm = _save_torch_resnet(_Bottleneck, [3, 4, 6, 3], 1000, path)
    _torchvision_key_schema_ok(torch.load(str(path), weights_only=True),
                               50)

    model = transform(lambda x, train=False: models.resnet50(
        x, 1000, train=train, torch_padding=True))
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params, state = model.init(jax.random.key(0), x0, False)
    params, state = import_torch_resnet_file(str(path), params, state,
                                             depth=50)

    xin = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(xin.transpose(0, 3, 1, 2))).numpy()
    out, _ = model.apply(params, state, None, jnp.asarray(xin), False)
    out = np.asarray(out)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)
    np.testing.assert_array_equal(out.argmax(-1), ref.argmax(-1))


@pytest.mark.slow
def test_torch_file_resnet18_logits_agree(tmp_path):
    path = tmp_path / "r18.pth"
    tm = _save_torch_resnet(_Basic, [2, 2, 2, 2], 10, path, seed=3)
    _torchvision_key_schema_ok(torch.load(str(path), weights_only=True),
                               18)

    model = transform(lambda x, train=False: models.resnet18(
        x, 10, train=train, torch_padding=True))
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params, state = model.init(jax.random.key(0), x0, False)
    params, state = import_torch_resnet_file(str(path), params, state,
                                             depth=18)

    xin = np.random.RandomState(2).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(xin.transpose(0, 3, 1, 2))).numpy()
    out, _ = model.apply(params, state, None, jnp.asarray(xin), False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_deeplab_finetune_from_torch_backbone(tmp_path):
    """The reference's actual workflow (SURVEY.md §2#11): DeepLabv3+
    warm-started from a (torch-format) pretrained classification
    backbone, backbone frozen, head fine-tuned."""
    from myconvnet_tpu.train import optim
    from myconvnet_tpu.train.losses import pixel_cross_entropy

    path = tmp_path / "r18.pth"
    _save_torch_resnet(_Basic, [2, 2, 2, 2], 10, path, seed=5)

    model = transform(lambda x, train=False: models.deeplab_v3_plus(
        x, 6, train=train, backbone_depth=18, aspp_features=32,
        decoder_low_features=16))
    x0 = jnp.zeros((2, 65, 65, 3), jnp.float32)
    params, state = model.init(jax.random.key(0), x0, True)
    stem_before = np.asarray(params["backbone/stem/conv"]["w"]).copy()
    params, state = import_torch_resnet_file(
        str(path), params, state, depth=18, load_head=False,
        prefix="backbone/")
    stem_imported = np.asarray(params["backbone/stem/conv"]["w"])
    assert np.abs(stem_imported - stem_before).max() > 1e-4  # really loaded
    # moving stats too (train-mode torch passes moved them off var=1)
    assert abs(float(np.mean(
        state["backbone/stem/bn"]["moving_var"])) - 1.0) > 1e-3

    opt = optim.with_frozen(optim.momentum(0.05, 0.9), ["backbone"])
    opt_state = opt.init(params)
    dec_key = next(k for k in params if k.startswith("decoder"))
    dec_before = np.asarray(params[dec_key]["w"]).copy()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 65, 65, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 6, (2, 65, 65)).astype(np.int32))

    @jax.jit
    def step(params, state, opt_state, i):
        def loss_fn(p):
            logits, new_s = model.apply(
                p, state, jax.random.fold_in(jax.random.key(7), i),
                x, True)
            return pixel_cross_entropy(logits, y, ignore_label=None), new_s
        (loss, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_p, new_o = opt.update(g, opt_state, params, i)
        return new_p, new_s, new_o, loss

    losses = []
    for i in range(3):
        params, state, opt_state, loss = step(params, state, opt_state,
                                              jnp.asarray(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # the head is learning
    # frozen backbone params bit-identical to the imported weights
    np.testing.assert_array_equal(
        np.asarray(params["backbone/stem/conv"]["w"]), stem_imported)
    # decoder actually moved
    assert np.abs(np.asarray(params[dec_key]["w"]) - dec_before).max() > 0


@pytest.mark.slow
def test_import_torch_vgg16_bn_into_ssd_trunk(tmp_path):
    """torchvision vgg16_bn -> SSD trunk warm start: a real torch-saved
    state_dict maps onto backbone/conv..conv_12 (+bn stats), and the
    first conv-bn-relu block agrees numerically with torch (before any
    pooling, where ceil-mode conventions cannot diverge)."""
    import torch

    # byte-faithful torchvision vgg16_bn `features` replica (no
    # torchvision in-env): Conv-BN-ReLU stacks + MaxPools in the exact
    # module order, so state_dict keys are features.0.weight,
    # features.1.running_mean, ... as the real checkpoint has them
    torch.manual_seed(0)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, c_in = [], 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers += [torch.nn.Conv2d(c_in, v, 3, padding=1),
                       torch.nn.BatchNorm2d(v),
                       torch.nn.ReLU(inplace=True)]
            c_in = v
    tv = torch.nn.Module()
    tv.features = torch.nn.Sequential(*layers)
    # randomize running stats so the import is distinguishable
    for m in tv.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    path = str(tmp_path / "vgg16_bn.pt")
    torch.save(tv.state_dict(), path)

    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.models.pretrained import import_torch_vgg16_file

    net = transform(lambda x, c, train=False: models.ssd300(
        x, c, train=train))
    params, state = net.init(jax.random.key(0),
                             jnp.zeros((1, 300, 300, 3)), 21)
    new_p, new_s = import_torch_vgg16_file(path, params, state)
    # every trunk conv landed (weights differ from init)
    for i in range(13):
        scope = "backbone/conv" + ("" if i == 0 else f"_{i}")
        assert not np.allclose(np.asarray(params[scope]["w"]),
                               new_p[scope]["w"])
    # first block agreement: conv1_1 + bn + relu on shared input
    x = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        tv.eval()
        ref = tv.features[:3](torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    # the SSD trunk's convs are bias-free — the importer folds torch's
    # conv bias into the BN running mean exactly; verify against torch
    # with the same bias-free block + imported (folded) stats
    from myconvnet_tpu import nn as mnn
    block = transform(lambda z: mnn.relu(mnn.batch_norm(
        mnn.conv(z, 64, 3, use_bias=False), train=False, eps=1e-5)))
    block.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    bp = {"conv": {"w": new_p["backbone/conv"]["w"]},
          "bn": {"gamma": new_p["backbone/bn"]["gamma"],
                 "beta": new_p["backbone/bn"]["beta"]}}
    bs = {"bn": {"moving_mean": new_s["backbone/bn"]["moving_mean"],
                 "moving_var": new_s["backbone/bn"]["moving_var"]}}
    out, _ = block.apply(bp, bs, None, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4,
                               rtol=2e-3)


def test_import_torch_vgg16_bn_mismatch_raises(tmp_path):
    """A BN-layout checkpoint into a BN-free model (or vice versa) is a
    numerically corrupt warm start — the importer must refuse."""
    import torch
    conv = torch.nn.Conv2d(3, 64, 3, padding=1)
    plain = torch.nn.Module()
    plain.features = torch.nn.Sequential(conv)  # no BN at features.1
    sd = plain.state_dict()

    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.models.pretrained import import_torch_vgg16

    net = transform(lambda x, c, train=False: models.tinydet(
        x, c, train=train, width=8))
    params, state = net.init(jax.random.key(0),
                             jnp.zeros((1, 96, 96, 3)), 4)
    # tinydet's backbone HAS BN scopes under a different naming; use an
    # ssd-like fake: params with a backbone/bn scope present
    fake_params = {"backbone/conv": {"w": np.zeros((3, 3, 3, 64),
                                                   np.float32)},
                   "backbone/bn": {"gamma": np.ones(64, np.float32),
                                   "beta": np.zeros(64, np.float32)}}
    fake_state = {"backbone/bn": {"moving_mean": np.zeros(64),
                                  "moving_var": np.ones(64)}}
    with pytest.raises(ValueError, match="BN mismatch"):
        import_torch_vgg16(sd, fake_params, fake_state)
