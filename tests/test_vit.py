"""ViT family: forward shapes, torchvision checkpoint import parity.

The torch model below reproduces torchvision's ``VisionTransformer``
module tree exactly (conv_proj / class_token / encoder.pos_embedding /
encoder.layers.encoder_layer_i.{ln_1, self_attention, ln_2, mlp} /
encoder.ln / heads.head) so its state_dict keys match the real
checkpoints byte-for-byte; the weights are random — the *format* and
the numerics mapping are the things under test (same strategy as
tests/test_pretrained_torch_file.py).
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn

from myconvnet_tpu.core import transform  # noqa: E402
from myconvnet_tpu.models import tinyvit, vit  # noqa: E402
from myconvnet_tpu.models.pretrained import (  # noqa: E402
    export_torch_vit, import_torch_vit, import_torch_vit_file)

# the "test" variant's config (models/vit.py VARIANTS)
PATCH, DIM, DEPTH, HEADS, MLP = 4, 32, 2, 2, 64


class _Block(tnn.Module):
    def __init__(self):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(DIM, eps=1e-6)
        self.self_attention = tnn.MultiheadAttention(DIM, HEADS,
                                                     batch_first=True)
        self.ln_2 = tnn.LayerNorm(DIM, eps=1e-6)
        self.mlp = tnn.Sequential(
            tnn.Linear(DIM, MLP), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(MLP, DIM), tnn.Dropout(0.0))

    def forward(self, x):
        h = self.ln_1(x)
        h, _ = self.self_attention(h, h, h, need_weights=False)
        x = x + h
        return x + self.mlp(self.ln_2(x))


class _Encoder(tnn.Module):
    def __init__(self, seq_len):
        super().__init__()
        self.pos_embedding = tnn.Parameter(
            torch.randn(1, seq_len, DIM) * 0.02)
        self.layers = tnn.Sequential(OrderedDict(
            (f"encoder_layer_{i}", _Block()) for i in range(DEPTH)))
        self.ln = tnn.LayerNorm(DIM, eps=1e-6)

    def forward(self, x):
        return self.ln(self.layers(x + self.pos_embedding))


class _TorchViT(tnn.Module):
    def __init__(self, img=8, num_classes=10):
        super().__init__()
        self.conv_proj = tnn.Conv2d(3, DIM, PATCH, PATCH)
        self.class_token = tnn.Parameter(torch.zeros(1, 1, DIM))
        self.encoder = _Encoder((img // PATCH) ** 2 + 1)
        self.heads = tnn.Sequential(OrderedDict(
            [("head", tnn.Linear(DIM, num_classes))]))

    def forward(self, x):                      # x: NCHW
        b = x.shape[0]
        x = self.conv_proj(x)                  # [B, D, g, g]
        x = x.flatten(2).transpose(1, 2)       # [B, N, D]
        x = torch.cat([self.class_token.expand(b, -1, -1), x], dim=1)
        return self.heads(self.encoder(x)[:, 0])


def _jax_vit(params, state, x_nhwc):
    fwd = transform(lambda x: tinyvit(x, 10))
    out, _ = fwd.apply(params, state, None, x_nhwc)
    return out


def test_vit_forward_shapes_and_train_mode():
    fwd = transform(lambda x, train: tinyvit(
        x, 10, train=train, dropout=0.1, attn_dropout=0.1,
        drop_path_rate=0.1))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 3))
    params, state = fwd.init(rng, x, True)
    out, _ = fwd.apply(params, state, rng, x, True)
    assert out.shape == (2, 10)
    e1, _ = fwd.apply(params, state, None, x, False)
    e2, _ = fwd.apply(params, state, None, x, False)
    np.testing.assert_array_equal(e1, e2)      # eval is deterministic


def test_vit_rejects_bad_inputs():
    with pytest.raises(ValueError):
        transform(lambda x: vit(x, 10, variant="nope")).init(
            jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 3)))
    with pytest.raises(ValueError):
        transform(lambda x: tinyvit(x, 10)).init(
            jax.random.PRNGKey(0), jnp.ones((1, 9, 9, 3)))


def test_torch_vit_file_roundtrip_logits_agree(tmp_path):
    torch.manual_seed(0)
    tmodel = _TorchViT().eval()
    path = tmp_path / "vit_test.pth"
    torch.save(tmodel.state_dict(), path)

    fwd = transform(lambda x: tinyvit(x, 10))
    rng = jax.random.PRNGKey(1)
    params, state = fwd.init(rng, jnp.ones((1, 8, 8, 3)))
    params, state = import_torch_vit_file(str(path), params, state)

    x = np.random.RandomState(3).randn(4, 8, 8, 3).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    j_logits = np.asarray(_jax_vit(params, state, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-4, atol=1e-4)


def test_export_import_roundtrip():
    fwd = transform(lambda x: tinyvit(x, 10))
    rng = jax.random.PRNGKey(2)
    params, state = fwd.init(rng, jnp.ones((1, 8, 8, 3)))
    sd = export_torch_vit(params)
    # re-import what we exported: must be an exact fixed point
    params2, _ = import_torch_vit(sd, params, state)
    for scope in params:
        for name in params[scope]:
            np.testing.assert_allclose(params2[scope][name],
                                       params[scope][name],
                                       rtol=1e-6, atol=1e-6)


def test_pos_embed_grid_resize():
    # checkpoint at 8x8 (grid 2x2) -> model at 16x16 (grid 4x4)
    src = transform(lambda x: tinyvit(x, 10))
    p_src, s_src = src.init(jax.random.PRNGKey(3), jnp.ones((1, 8, 8, 3)))
    sd = export_torch_vit(p_src)
    dst = transform(lambda x: tinyvit(x, 10))
    p_dst, s_dst = dst.init(jax.random.PRNGKey(4), jnp.ones((1, 16, 16, 3)))
    p_new, _ = import_torch_vit(sd, p_dst, s_dst)
    assert p_new["~"]["pos_embed"].shape == (1, 17, DIM)
    # CLS slot is copied untouched
    np.testing.assert_allclose(p_new["~"]["pos_embed"][:, 0],
                               np.asarray(p_src["~"]["pos_embed"][:, 0]),
                               rtol=1e-6, atol=1e-6)
    out, _ = dst.apply(p_new, s_dst, None, jnp.ones((2, 16, 16, 3)))
    assert out.shape == (2, 10)
